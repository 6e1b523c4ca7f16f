"""Semantic pins for wave-3 operators whose certification is otherwise
oracle-only: the BPE merge-application overlap rule, the pair-counting
within-word multiplicity, and the entropy identities."""

import math

from pyspark.sql import functions as F


def test_bpe_merge_application_is_nonoverlapping(spark):
    """'a a a' with merge 'a a' must become 'aa a' (greedy left-to-right
    non-overlap — BPE's application rule), not 'aa aa' or 'a aa'."""
    df = spark.createDataFrame([("a a a",)], "sw string")
    out = df.select(F.expr("replace(sw, 'a a', 'aa')").alias("m")).first()
    assert out["m"] == "aa a"


def test_bpe_pairs_count_within_word_multiplicity(spark):
    """'aaa' contributes the pair 'aa' TWICE per occurrence (positions
    1-2 and 2-3), weighted by the word-type count."""
    from ocr_image_to_text_spark import queries as q

    df = spark.createDataFrame([(0, "aaa aaa xy")], "doc_id long, text string")
    wt = (df.select(F.explode(F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"\w+"), 0)).alias("w"))
          .groupBy("w").agg(F.count("*").alias("n")))
    pairs = (wt.filter(F.length("w") >= 2)
             .select(F.explode(F.expr(
                 "transform(sequence(1, length(w) - 1),"
                 " i -> substring(w, i, 2))")).alias("pair"), "n")
             .groupBy("pair").agg(F.sum("n").alias("c")))
    got = {r["pair"]: r["c"] for r in pairs.collect()}
    assert got["aa"] == 4   # 2 positions x word count 2
    assert got["xy"] == 1


def test_char_entropy_identities(spark):
    """Uniform string of k distinct chars → H = ln k; constant string
    → H = 0 (both on the floored 1e6 grid)."""
    from ocr_image_to_text_spark.queries import doc_char_entropy

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "documents.parquet")
        spark.createDataFrame(
            [(0, "abcd", "s", "en"), (1, "aaaa", "s", "en")],
            "doc_id long, text string, source string, lang string"
        ).write.parquet(p)
        rows = {r["doc_id"]: r for r in doc_char_entropy(spark, d).collect()}
    # uniform: ln 4 ≈ 1.386294 → per-type terms are 1*ln(1)=0, so
    # entropy = floor(1e6*ln 4)
    assert rows[0]["entropy_x1e6"] == math.floor(1e6 * math.log(4))
    # constant: ln 4 - (4 ln 4)/4 = 0 on the integer grid (floors cancel
    # within 1 micro-unit)
    assert 0 <= rows[1]["entropy_x1e6"] <= 1
