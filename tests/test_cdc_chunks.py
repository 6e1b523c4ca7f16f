"""CDC chunking: the shift-robustness property that justifies
content-defined over fixed-size chunking, plus oracle-shape sanity."""

import pytest

from ocr_image_to_text_spark import dedup


def _chunk_keys(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = dedup.cdc_chunk_stats(df).collect()
    return {r["doc_id"]: r for r in rows}


def _raw_chunks(spark, text):
    """Materialize the actual chunk key multiset for one doc."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    words = df.select(
        "doc_id",
        F.posexplode(F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"\w+"), 0)).alias("pos", "w"))
    flag = (F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10)
            .cast("long") % dedup.CDC_DIVISOR == 0).cast("long")
    run = (Window.partitionBy("doc_id").orderBy("pos")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ch = (words.select("doc_id", "pos", "w",
                       F.sum(flag).over(run).alias("chunk_id"))
          .groupBy("doc_id", "chunk_id")
          .agg(F.md5(F.concat_ws(" ", F.transform(
              F.array_sort(F.collect_list(F.struct("pos", "w"))),
              lambda s: s["w"]))).alias("k")))
    return sorted(r["k"] for r in ch.collect())


BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
        "omega one two three four five six seven eight nine ten "
        "eleven twelve thirteen fourteen fifteen sixteen") * 3


def test_cdc_insertion_perturbs_only_local_chunks(spark):
    """Inserting one word keeps most chunk keys identical — the suffix
    after the insertion point re-aligns (fixed-size offset chunking
    would invalidate every chunk past the edit)."""
    words = BASE.split()
    edited = " ".join(words[:5] + ["INSERTED"] + words[5:])
    a = _raw_chunks(spark, BASE)
    b = _raw_chunks(spark, edited)
    shared = len(set(a) & set(b))
    # all but the edited chunk (and possibly its immediate neighbour,
    # if the insertion lands on a boundary word) survive
    assert shared >= len(set(a)) - 2
    assert a != b  # the edit is visible


def test_cdc_exact_dup_docs_fully_flagged(spark):
    stats = _chunk_keys(spark, [BASE, BASE, "unique words only here"])
    assert stats[0]["n_dup_chunks"] == stats[0]["n_chunks"]
    assert stats[1]["dup_frac_x1000"] == 1000
    assert stats[2]["n_dup_chunks"] == 0


def test_cdc_empty_text_yields_no_rows(spark):
    stats = _chunk_keys(spark, ["", "xyz"])
    assert 0 not in stats and 1 in stats
