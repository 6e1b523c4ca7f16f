"""Catalog seam: Iceberg on a real cluster, Parquet warehouse in the sandbox.

The north_rule targets Iceberg tables. This sandbox ships no Iceberg
runtime jar and no network, so every table access goes through this seam:

* `iceberg_available(spark)` probes for the SparkCatalog class;
* with Iceberg: `configure()` returns the builder configs for a
  `SparkCatalog` (`spark.sql.catalog.lake=org.apache.iceberg...`), tables
  resolve as `lake.db.transcripts`, the extraction manifest becomes a real
  Iceberg table maintained with `MERGE INTO`, and the per-wave data commit
  is `overwritePartitions()` (atomic snapshot);
* without: `read_table`/`write_table` fall back to the Parquet warehouse
  (`transcripts.warehouse_dir()`), and jobs/extract_job.py emulates the
  snapshot semantics with dynamic partition overwrite + append-only
  manifest rows (write-ahead ordering documented there).

Flipping a cluster run to Iceberg is therefore config-only; no operator
code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..transcripts import warehouse_dir

ICEBERG_CATALOG = "lake"


def configure(warehouse: str | None = None) -> dict[str, str]:
    """Builder configs enabling an Iceberg catalog (requires the runtime jar,
    e.g. spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13)."""
    wh = warehouse or os.path.join(warehouse_dir(), "iceberg")
    return {
        f"spark.sql.catalog.{ICEBERG_CATALOG}":
            "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{ICEBERG_CATALOG}.type": "hadoop",
        f"spark.sql.catalog.{ICEBERG_CATALOG}.warehouse": wh,
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    }


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """`name` is a logical table name (e.g. 'transcripts/t1')."""
    if iceberg_available(spark):
        return spark.read.table(f"{ICEBERG_CATALOG}.{name.replace('/', '.')}")
    return spark.read.parquet(os.path.join(warehouse_dir(), name + ".parquet"))


def write_table(df: DataFrame, name: str, mode: str = "overwrite") -> None:
    if iceberg_available(df.sparkSession):
        df.writeTo(f"{ICEBERG_CATALOG}.{name.replace('/', '.')}") \
            .using("iceberg").createOrReplace()
        return
    df.write.mode(mode).parquet(os.path.join(warehouse_dir(), name + ".parquet"))
