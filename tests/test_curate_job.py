"""Kill-and-resume semantics of the checkpointed curation job — the
manifest pattern generalized to the documents family, plus the phase-0
invariant: a resumed run strips with the SAME committed frequent-line
set as the original run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_image_to_text_spark.jobs.curate_job import run_curate_job

N_BUCKETS = 8
WAVE = 3
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def seeded_input(spark, tmp_path_factory):
    """Curate the boilerplate-seeded derivation (the raw sandbox corpus
    carries no frequent lines, which would make stripping vacuous)."""
    from ocr_image_to_text_spark.queries import _bp_seeded_docs

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    p = str(tmp_path_factory.mktemp("seeded")) + "/documents.parquet"
    _bp_seeded_docs(docs).write.parquet(p)
    return p


def _curated_sorted(spark, out_dir):
    df = spark.read.parquet(os.path.join(out_dir, "curated"))
    cols = sorted(c for c in df.columns if c != "part_id")
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_curate_kill_and_resume_matches_single_shot(
        spark, tmp_path_factory, seeded_input):
    out_a = str(tmp_path_factory.mktemp("curate_resume"))
    out_b = str(tmp_path_factory.mktemp("curate_single"))

    with pytest.raises(RuntimeError, match="injected failure"):
        run_curate_job(spark, seeded_input, out_a, n_buckets=N_BUCKETS,
                       wave_size=WAVE, fail_after_waves=1)
    resumed = run_curate_job(spark, seeded_input, out_a,
                             n_buckets=N_BUCKETS, wave_size=WAVE)
    assert resumed["resumed_parts"] == WAVE
    assert resumed["processed_parts"] == N_BUCKETS - WAVE

    single = run_curate_job(spark, seeded_input, out_b,
                            n_buckets=N_BUCKETS, wave_size=N_BUCKETS)
    assert _curated_sorted(spark, out_a) == _curated_sorted(spark, out_b)
    assert resumed["n_kept"] == single["n_kept"] > 0

    # the gate is non-vacuous: some docs were dropped, and stripping bit
    m = spark.read.parquet(os.path.join(out_a, "_manifest"))
    agg = m.filter(F.col("status") == "done").agg(
        F.sum("n_docs").alias("n"), F.sum("n_kept").alias("k"),
        F.sum("chars_in").alias("ci"), F.sum("chars_out").alias("co")
    ).collect()[0]
    assert agg.k < agg.n
    assert agg.co < agg.ci

    # phase-0 invariant: the resumed run reused the committed bp set
    assert os.path.exists(os.path.join(out_a, "_bp_set", "_SUCCESS"))


def test_curate_resume_refuses_changed_buckets(
        spark, tmp_path_factory, seeded_input):
    out = str(tmp_path_factory.mktemp("curate_mismatch"))
    with pytest.raises(RuntimeError, match="injected failure"):
        run_curate_job(spark, seeded_input, out, n_buckets=N_BUCKETS,
                       wave_size=WAVE, fail_after_waves=1)
    with pytest.raises(ValueError, match="resume mismatch"):
        run_curate_job(spark, seeded_input, out, n_buckets=N_BUCKETS * 2,
                       wave_size=WAVE)
