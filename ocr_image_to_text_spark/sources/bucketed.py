"""Bucketed-table co-located joins — the shuffle-elimination seam.

At 100 TB the dominant recurring cost of the extraction warehouse is the
join between per-turn facts keyed on conv_id (spans ⨝ rollup ⨝ manifest,
extraction ⨝ quality gates). Writing both sides as Spark bucketed tables
(`bucketBy(N, conv_id)` + `sortBy`) makes every such join shuffle-FREE:
the scan's output partitioning already satisfies the join's requirement,
so Catalyst plans SortMergeJoin with NO Exchange on either side — the
Parquet-warehouse analog of Iceberg's `bucket(N, conv_id)` partition
transform (one config flip via sources.catalog, same as every other
table access here).

Pinned by tests/test_bucketed_join.py: the co-located join plan contains
zero Exchange operators, and the same join over plain parquet contains
two — the exhibit is the DIFFERENCE, not an absolute claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None) -> None:
    """Save `df` as a bucketed managed table (overwrite)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    w = w.sortBy(*(sort_cols or keys))
    w.format("parquet").saveAsTable(table)


def colocated_join(spark: SparkSession, left: str, right: str,
                   on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With equal
    bucket counts the physical plan carries no Exchange."""
    return spark.table(left).join(spark.table(right), on, how)
