#!/usr/bin/env python
"""Two-parallelism scaling-efficiency harness (north_rule evidence).

The rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so the sanctioned
stand-in is the same spark-submit job at two parallelism levels on the
same input: local[N] vs local[4N] (default N=8). Each level runs in a
fresh subprocess (fresh JVM, cold Python workers) against the bench-tier
transcripts; throughput counts only wave-processing wall time (session
startup excluded on both sides identically).

    efficiency = (thr_4N / thr_N) / 4

Writes/updates the "Scaling" section consumed by BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cpus: int, sf_dir: str, n_buckets: int, wave_size: int) -> dict:
    with tempfile.TemporaryDirectory(prefix=f"scale{cpus}_") as out:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "extract.py"),
             "--sf-dir", sf_dir, "--out", out, "--cpus", str(cpus),
             "--n-buckets", str(n_buckets), "--wave-size", str(wave_size)],
            capture_output=True, text=True, check=True, cwd=REPO)
        summary = json.loads(p.stdout.strip().splitlines()[-1])
    return summary


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("SCALING_N", "8"))
    n_buckets = int(os.environ.get("SCALING_BUCKETS", "32"))
    wave_size = int(os.environ.get("SCALING_WAVE", "16"))

    from ocr_image_to_text_spark.transcripts import ensure_transcripts_for_sf_dir
    ensure_transcripts_for_sf_dir(sf_dir)  # outside all timing

    levels = {}
    for cpus in (n, 4 * n):
        s = run_level(cpus, sf_dir, n_buckets, wave_size)
        thr = s["n_turns"] / s["wall_s"]
        levels[cpus] = {"wall_s": s["wall_s"], "n_turns": s["n_turns"],
                        "turns_per_sec": round(thr, 1)}
        print(f"local[{cpus}]: {s['n_turns']} turns in {s['wall_s']}s "
              f"→ {thr:.1f} turns/s", file=sys.stderr)

    eff = (levels[4 * n]["turns_per_sec"] / levels[n]["turns_per_sec"]) / 4
    result = {"sf_dir": sf_dir, "N": n, "levels": levels,
              "scaling_efficiency": round(eff, 3), "target": 0.8,
              "pass": eff >= 0.8}
    print(json.dumps(result))
    with open(os.path.join(REPO, "scaling_result.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
