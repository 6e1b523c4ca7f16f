"""Skew dispersion (north_rule salting) and the F6 oversized-payload cap."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocr_image_to_text_spark.jobs.extract_job import run_extract_job
from ocr_image_to_text_spark.operators.extract import extract_turns
from ocr_image_to_text_spark.transcripts import ensure_transcripts


def test_salted_repartition_spreads_skewed_conversation(spark):
    """A 500-turn conversation must spread across (nearly) all tasks of the
    UDF stage — the salt hashes (conv_id, turn_idx), not conv_id alone."""
    t2 = ensure_transcripts("t2")  # contains 2 skew convs of 500 turns
    df = spark.read.parquet(t2)
    parts = 8
    salted = df.repartition(parts, F.xxhash64("conv_id", "turn_idx"))
    dist = (salted.withColumn("pid", F.spark_partition_id())
            .filter(F.col("conv_id") == "conv-skew-000")
            .groupBy("pid").count().collect())
    assert len(dist) == parts  # every partition got a slice
    counts = [r["count"] for r in dist]
    assert max(counts) < 500 * 0.3  # no partition hoards the conversation

    # contrast: conv_id-only hashing puts the whole conversation in 1 part
    unsalted = df.repartition(parts, F.col("conv_id"))
    dist1 = (unsalted.withColumn("pid", F.spark_partition_id())
             .filter(F.col("conv_id") == "conv-skew-000")
             .select("pid").distinct().count())
    assert dist1 == 1


def test_oversized_payload_cap_logged_not_silent(spark, tmp_path):
    tpath = ensure_transcripts("t1")
    out = str(tmp_path / "capped")
    cap = 800
    run_extract_job(spark, tpath, out, n_buckets=4, wave_size=4,
                    max_payload_chars=cap)

    df = spark.read.parquet(tpath)
    size = F.length(F.coalesce("text", F.lit(""))) + F.length(F.coalesce("tool", F.lit("")))
    n_over = df.filter(size > cap).count()
    n_keep = df.count() - n_over
    assert n_over > 0  # the tier actually exercises the cap

    m = spark.read.parquet(os.path.join(out, "_manifest")).filter("status='done'")
    got_over = m.agg(F.sum("n_oversized")).collect()[0][0]
    got_turns = m.agg(F.sum("n_turns")).collect()[0][0]
    assert got_over == n_over          # drops are accounted, per manifest
    assert got_turns == n_keep         # rollup holds exactly the kept turns
    roll = spark.read.parquet(os.path.join(out, "rollup"))
    assert roll.count() == n_keep
