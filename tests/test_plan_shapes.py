"""Structural plan assertions — the scale properties VERDICT flagged.

These pin the *shape* of the physical plan, not timings: plan regressions
(a reintroduced global-window top-k, a driver collect, a second UDF pass)
fail loudly here long before any benchmark would notice.
"""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF),
    reason="driver-provided testdata not present (plans are data-independent)")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spans_plan_single_udf_eval(spark):
    """The cached-session spans plan evaluates the dispatch UDF exactly
    once: the Generate (posexplode) derives from the persisted scalar
    extraction (InMemoryTableScan), never re-running Python per span."""
    from ocr_image_to_text_spark import queries as q

    q.extract_rollup(spark, SF)  # warm the session extraction cache
    plan = _plan(q.extract_spans(spark, SF))
    assert plan.count("ArrowEvalPython") == 1
    assert "InMemoryTableScan" in plan
    assert "Generate" in plan
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python


def test_topk_plans_use_take_ordered(spark):
    """doc_topk_keyword_x6 / doc_keyword_topk_x5 / chunk_l2_topk compile
    to TakeOrderedAndProject — per-partition top-k + k·p merge, not a
    single-partition sort of the corpus."""
    from ocr_image_to_text_spark import queries as q

    for fn in (q.doc_topk_keyword_x6, q.doc_keyword_topk_x5):
        plan = _plan(fn(spark, SF))
        assert "TakeOrderedAndProject" in plan, plan[:2000]

    plan = _plan(q.chunk_l2_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_minhash_lsh_single_signature_evaluation(spark):
    """The shingle+minhash subtree is evaluated ONCE per doc: band rows
    come from a single explode over the cached signature frame, and the
    self-join / verify branches read InMemoryTableScans. The round-2
    shape (bands-way unionByName over an unpersisted sig frame) showed
    one full md5-minhash subtree per band in the executed plan."""
    from ocr_image_to_text_spark import queries as q

    plan = _plan(q.dedup_minhash_lsh(spark, SF))
    # All four consumers (2 band-join sides, 2 verify sides) hit the
    # cache; the shingle+md5 subtree lines that toString() prints under
    # each scan are the cached relation's ONE-TIME build plan, displayed
    # per scan, not re-executed.
    assert plan.count("InMemoryTableScan") >= 4, plan[:3000]
    # Band emission is one explode per join branch, never a union of
    # per-band projections (each of which re-ran the signature subtree).
    assert "Union" not in plan
    assert plan.count("Generate explode(array(struct(band") == 2, plan[:3000]


def test_emb_dup_pairs_is_distributed(spark):
    """No driver collect: the all-pairs cosine is a block equi-join.
    LocalTableScan / ExistingRDD in the plan would betray a toPandas
    round-trip; Python nodes would betray a UDF fallback."""
    from ocr_image_to_text_spark import queries as q

    plan = _plan(q.emb_dup_pairs(spark, SF))
    for forbidden in ("LocalTableScan", "ExistingRDD", "MapInPandas",
                      "ArrowEvalPython", "BatchEvalPython"):
        assert forbidden not in plan
    assert "Generate" in plan  # block-pair replication via explode
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """Decontamination joins the corpus gram stream against the BENCHMARK
    gram index via broadcast — eval sets are tiny, so the corpus side
    must never shuffle for the join (only the final doc_id rollup
    shuffles). A SortMergeJoin here would shuffle 100 TB of grams."""
    from ocr_image_to_text_spark import queries as q

    plan = _plan(q.corpus_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan
    for forbidden in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython",
                      "LocalTableScan"):
        assert forbidden not in plan


def test_round3_corpus_ops_plan_shapes(spark):
    """Round-3 wave plans: BM25 stays TakeOrdered with a broadcast idf
    (never a corpus-token shuffle against a 5-row table), DSIR keeps its
    broadcast parameter table, the C4 page filter never shuffles, and
    none of them run Python."""
    from ocr_image_to_text_spark import queries as q

    bm25 = _plan(q.doc_bm25_topk(spark, SF))
    assert "TakeOrderedAndProject" in bm25
    assert "BroadcastHashJoin" in bm25
    assert "CartesianProduct" not in bm25

    dsir = _plan(q.corpus_dsir_weights(spark, SF))
    assert "BroadcastHashJoin" in dsir
    assert "CartesianProduct" not in dsir

    c4 = _plan(q.doc_c4_page_filter(spark, SF))
    assert "hashpartitioning" not in c4, "the page filter must not shuffle"

    for plan in (bm25, dsir, c4):
        assert "EvalPython" not in plan and "InPandas" not in plan


def test_tpch_no_hardcoded_broadcast_on_growing_dims(spark):
    """TPC-H Q3/Q5 shapes carry NO broadcast hint on the
    scale-factor-growing tables (customer, supplier — VERDICT r3
    wrong-#1): with the size threshold disabled, those joins compile to
    SortMergeJoin, and the only BroadcastExchanges left in Q5 are the
    explicit hints on the FIXED-size dims (region→nation, nation→
    supplier). At small SF the threshold re-enables the broadcasts —
    statistics-driven, which is the point."""
    from ocr_image_to_text_spark import queries as q

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p3 = _plan(q.tpch_top_revenue(spark, SF))
        assert "SortMergeJoin" in p3       # customer join not hint-forced
        assert "BroadcastExchange" not in p3
        p5 = _plan(q.tpch_local_supplier_revenue(spark, SF))
        assert "SortMergeJoin" in p5       # customer + supplier joins
        # exactly the two fixed-dim hints survive threshold-off
        assert p5.count("BroadcastExchange") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
