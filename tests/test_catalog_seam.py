"""Iceberg catalog-seam contract (VERDICT r4 #8): the sandbox ships no
Iceberg runtime jar, so the seam's Iceberg branch cannot execute here —
this pins the CONTRACT instead: the exact builder configs, the logical→
catalog name mapping, and the exact write API calls (`writeTo(...)
.using("iceberg").createOrReplace()`) the Iceberg path must emit, plus
the Parquet fallback actually taken in this environment. Flipping a
cluster run to Iceberg is then config-only: these strings are what the
cluster session builder consumes verbatim.
"""

from __future__ import annotations

import os

from ocr_image_to_text_spark.sources import catalog
from ocr_image_to_text_spark.transcripts import warehouse_dir


def test_configure_emits_exact_iceberg_configs():
    conf = catalog.configure(warehouse="/lake/wh")
    assert conf == {
        "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.lake.type": "hadoop",
        "spark.sql.catalog.lake.warehouse": "/lake/wh",
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions",
    }
    # default warehouse resolves inside the repo warehouse
    assert catalog.configure()["spark.sql.catalog.lake.warehouse"] == \
        os.path.join(warehouse_dir(), "iceberg")


def test_sandbox_has_no_iceberg_and_falls_back_to_parquet(spark, tmp_path):
    """In this environment iceberg_available is False and the seam
    round-trips through the Parquet warehouse."""
    assert catalog.iceberg_available(spark) is False
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    catalog.write_table(df, "contract_probe/t0")
    path = os.path.join(warehouse_dir(), "contract_probe/t0.parquet")
    assert os.path.exists(path)
    got = sorted(map(tuple, catalog.read_table(
        spark, "contract_probe/t0").collect()))
    assert got == [(1, "a"), (2, "b")]
    import shutil

    shutil.rmtree(os.path.dirname(path))


def test_iceberg_branch_emits_exact_write_api_calls(spark, monkeypatch):
    """Force the seam down its Iceberg branch with the availability probe
    stubbed True and the DataFrame/reader APIs recorded: the contract is
    writeTo('lake.db.table').using('iceberg').createOrReplace() and
    read.table('lake.db.table') with '/'→'.' logical-name mapping."""
    calls: list = []

    class FakeWriter:
        def __init__(self, name):
            self.name = name

        def using(self, fmt):
            calls.append(("using", self.name, fmt))
            return self

        def createOrReplace(self):
            calls.append(("createOrReplace", self.name))

    class FakeDF:
        sparkSession = spark

        def writeTo(self, name):
            calls.append(("writeTo", name))
            return FakeWriter(name)

    class FakeReader:
        def table(self, name):
            calls.append(("read.table", name))
            return "sentinel-df"

    class FakeSpark:
        read = FakeReader()

    monkeypatch.setattr(catalog, "iceberg_available", lambda s: True)
    catalog.write_table(FakeDF(), "transcripts/t1")
    assert calls == [
        ("writeTo", "lake.transcripts.t1"),
        ("using", "lake.transcripts.t1", "iceberg"),
        ("createOrReplace", "lake.transcripts.t1"),
    ]
    calls.clear()
    assert catalog.read_table(FakeSpark(), "db/tbl") == "sentinel-df"
    assert calls == [("read.table", "lake.db.tbl")]
