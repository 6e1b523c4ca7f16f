"""north_rule letter: the extraction job runs via `spark-submit
--py-files dist/ocr_image_to_text_spark.zip`.

The job script is copied OUTSIDE the repo before launch, so its
`sys.path.insert(repo_parent)` points at an empty temp dir and the ONLY
source of the `ocr_image_to_text_spark` package is the --py-files zip —
a missing module in the zip fails this test, not just a real cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles_zip(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, REPO)
    from ocr_image_to_text_spark.transcripts import ensure_transcripts
    from tools.package import main as build_zip

    input_parquet = ensure_transcripts("t1")
    zip_path = build_zip()

    job = tmp_path / "extract.py"
    shutil.copy(os.path.join(REPO, "jobs", "extract.py"), job)
    out = tmp_path / "exout"
    r = subprocess.run(
        [spark_submit, "--py-files", zip_path, str(job),
         "--input", input_parquet, "--out", str(out),
         "--cpus", "4", "--n-buckets", "8", "--wave-size", "8"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["processed_parts"] == 8
    assert summary["n_turns"] > 0
    assert (out / "_manifest").exists()
    assert (out / "spans").exists() and (out / "rollup").exists()
