"""SparkSession factory tuned for the extraction engine.

Local-mode settings mirror what a 1000-executor cluster run would set per
executor; the Iceberg catalog seam lives in sources/catalog.py (no Iceberg
runtime jar in this sandbox — Parquet warehouse fallback, SURVEY.md §7).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ocr-extract", master: str | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")]
        shuffle_partitions = 32 if n == "*" else max(int(n), 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow everywhere: the extractors are vectorized pandas UDFs
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # keep python workers warm between stages
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # local mode: driver heap IS the executor heap — size it for
        # 32 concurrent tasks holding Arrow batches + persisted blocks
        # (8g measured 3x wall-time GC thrash on the bench job)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # task-side commit (v2): avoids the driver-serial rename storm on
        # partitioned writes with many files
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
