"""Corpus-statistical boilerplate suppression (CCNet frequent-line gate).

Value semantics on a hand-built corpus plus the plan shapes that make the
pair scale: detection compacts per-doc BEFORE its single line shuffle, and
application is a broadcast of the 1-row gated set — never an anti-join
shuffle of the corpus.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver-provided testdata not present")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mini_docs(spark):
    # 10 docs; "shared footer" in 6 of them (>= floor threshold 5),
    # "rare line" in 2; doc 0 repeats the footer INSIDE one doc (must
    # count once); doc 1 carries a whitespace/case variant (must
    # normalize onto the same line key).
    rows = []
    for i in range(10):
        body = [f"unique body line {i}."]
        if i < 6:
            body.append("Shared Footer." if i != 1 else "  shared footer. ")
        if i == 0:
            body.append("Shared Footer.")  # intra-doc repeat
        if i in (7, 8):
            body.append("rare line")
        rows.append((i, "\n".join(body)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_frequent_lines_gate(spark):
    from ocr_image_to_text_spark.queries import _bp_frequent_lines

    out = {r["line"]: r["doc_freq"]
           for r in _bp_frequent_lines(_mini_docs(spark)).collect()}
    # normalized key, counted per DOCUMENT (intra-doc repeat = 1)
    assert out == {"shared footer.": 6}


def test_strip_removes_only_gated_lines(spark):
    from ocr_image_to_text_spark.cachectl import release_caches
    from ocr_image_to_text_spark.queries import _bp_frequent_lines

    docs = _mini_docs(spark)
    bp = _bp_frequent_lines(docs).agg(
        F.array_sort(F.collect_set("line")).alias("bp"))
    lines = F.split(F.col("text"), "\n", -1)
    kept = F.filter(lines, lambda l: ~F.array_contains(
        F.col("bp"), F.trim(F.lower(l))))
    out = {r["doc_id"]: r["clean"] for r in docs.crossJoin(F.broadcast(bp))
           .select("doc_id", F.concat_ws("\n", kept).alias("clean"))
           .collect()}
    release_caches()
    for i in range(10):
        assert f"unique body line {i}." in out[i]
        assert "footer" not in out[i].lower()
    assert "rare line" in out[7] and "rare line" in out[8]


@needs_testdata
def test_strip_full_query_accounting(spark):
    """End-to-end over the driver corpus: chars_out + removed-line chars
    reconcile with chars_in, and no kept doc still contains a gated
    line."""
    from ocr_image_to_text_spark.cachectl import release_caches
    from ocr_image_to_text_spark.queries import (
        corpus_boilerplate_lines, doc_strip_boilerplate)

    bp = {r["line"] for r in corpus_boilerplate_lines(spark, SF).collect()}
    assert bp  # seeds guarantee non-vacuity
    rows = doc_strip_boilerplate(spark, SF).collect()
    release_caches()
    assert len(rows) > 0
    for r in rows:
        assert r["n_kept_lines"] <= r["n_lines"]
        assert r["chars_out"] <= r["chars_in"]
        for line in r["clean_text"].split("\n"):
            assert line.strip().lower() not in bp


@needs_testdata
def test_strip_plan_broadcasts_gated_set(spark):
    """The application pass must broadcast the 1-row gated set (map-only
    per doc) — a SortMergeJoin here would mean the corpus is being
    shuffled per line."""
    from ocr_image_to_text_spark.cachectl import release_caches
    from ocr_image_to_text_spark.queries import doc_strip_boilerplate

    plan = _plan(doc_strip_boilerplate(spark, SF))
    release_caches()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


@needs_testdata
def test_tpch_wave2_plan_shapes(spark):
    """Q6 pushes every predicate to the scan and shuffles no data rows;
    Q10 broadcasts only nation (customer/orders/lineitem grow linearly
    with scale factor); the top-k compiles to TakeOrderedAndProject."""
    from ocr_image_to_text_spark.queries import (
        tpch_forecast_revenue, tpch_returned_items)

    plan = _plan(tpch_forecast_revenue(spark, SF))
    assert "PushedFilters:" in plan
    # column pruning: the scan reads exactly the four needed columns
    assert ("ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
            "l_discount:double,l_shipdate:timestamp_ntz>") in plan
    assert "SortMergeJoin" not in plan and "Generate" not in plan

    plan = _plan(tpch_returned_items(spark, SF))
    assert "TakeOrderedAndProject" in plan
    # nation may broadcast; the linear tables must not carry a hint —
    # with AQE off at analysis time they stay shuffle joins.
    assert "broadcast(customer" not in plan.lower()


@needs_testdata
def test_weighted_sample_partitioning_invariant(spark):
    """The A-ES sample must be a pure function of the data — identical
    at any partitioning — and must compile to TakeOrderedAndProject,
    never a global sort."""
    from ocr_image_to_text_spark.queries import corpus_sample_weighted

    base = corpus_sample_weighted(spark, SF)
    assert "TakeOrderedAndProject" in _plan(base)
    rows = {tuple(r) for r in base.collect()}

    import ocr_image_to_text_spark.queries as q
    from pyspark.sql import functions as F
    docs = q._docs(spark, SF)
    for n in (1, 13):
        u = ((F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                 1, 8), 16, 10).cast("long")
              % 1000000) + 1) / 1000000.0
        w = F.greatest(
            F.lit(1).cast("long"),
            F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                        F.lit(r"\w+"), 0)).cast("long"))
        key = F.floor(F.lit(1000000.0) * F.log(u) / w).cast("long")
        got = {tuple(r) for r in docs.repartition(n)
               .select(F.col("doc_id").cast("long").alias("doc_id"),
                       w.alias("n_tokens"), key.alias("key_x1e6"))
               .orderBy(F.desc("key_x1e6"), F.asc("doc_id")).limit(100)
               .collect()}
        assert got == rows
    # weighting sanity: the sample's mean token count exceeds the
    # corpus mean (longer docs draw less-negative ln(u)/w keys)
    from pyspark.sql import functions as F2
    corpus_mean = docs.agg(F2.avg(F2.size(F2.regexp_extract_all(
        F2.lower(F2.col("text")), F2.lit(r"\w+"), 0)))).first()[0]
    sample_mean = sum(r[1] for r in rows) / len(rows)
    assert sample_mean > corpus_mean


@needs_testdata
def test_pq_encode_invariants(spark):
    """PQ self-consistency: the seed codewords ARE the sub-vectors of
    vec_id < ksub, so those vectors reconstruct exactly (err 0, codes =
    own id); every error is non-negative and every code in range."""
    from ocr_image_to_text_spark.cachectl import release_caches
    from ocr_image_to_text_spark.queries import emb_pq_encode

    rows = emb_pq_encode(spark, SF).collect()
    release_caches()
    assert rows
    for r in rows:
        for s in range(4):
            assert 0 <= r[f"code{s}"] < 16
        assert r["err_microsq"] >= 0
        if r["vec_id"] < 16:
            assert r["err_microsq"] == 0
            assert all(r[f"code{s}"] == r["vec_id"] for s in range(4))
