"""Bucketed co-located joins eliminate the join shuffle (north_star:
"bucketing for co-located joins"). The exhibit is differential: the same
conv_id join costs two Exchanges over plain parquet and ZERO over
bucketed tables."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ocr_image_to_text_spark.sources.bucketed import (colocated_join,
                                                      write_bucketed)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def facts(spark):
    rollup = spark.range(0, 2000).select(
        F.concat(F.lit("conv-"), (F.col("id") % 97).cast("string"))
        .alias("conv_id"),
        (F.col("id") % 40).cast("int").alias("turn_idx"),
        (F.col("id") * 17 % 1000).alias("chars_out"))
    spans = rollup.select(
        "conv_id", "turn_idx",
        (F.col("chars_out") % 7).cast("int").alias("span_start"))
    return rollup, spans


def test_bucketed_join_is_shuffle_free(spark, facts, tmp_path):
    rollup, spans = facts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # baseline: plain-source join shuffles BOTH sides. Joining on the
        # conversation key alone is the warehouse's recurring shape —
        # hash(conv_id) IS the table layout (north_star partitioning).
        plain = rollup.join(spans.withColumnRenamed("turn_idx", "t2"),
                            ["conv_id"])
        assert _plan(plain).count("Exchange") >= 2

        write_bucketed(rollup, "b_rollup", ["conv_id"], 8,
                       sort_cols=["conv_id"])
        write_bucketed(spans.withColumnRenamed("turn_idx", "t2"),
                       "b_spans", ["conv_id"], 8, sort_cols=["conv_id"])
        j = colocated_join(spark, "b_rollup", "b_spans", ["conv_id"])
        plan = _plan(j)
        assert "Exchange" not in plan  # co-located: scan partitioning reused
        assert "SortMergeJoin" in plan
        # and it computes the right thing
        assert j.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_rollup")
        spark.sql("DROP TABLE IF EXISTS b_spans")
