#!/usr/bin/env python
"""Two-parallelism scaling-efficiency harness (north_rule evidence).

The rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so the sanctioned
stand-in is the same spark-submit job at two parallelism levels on the
same input: local[N] vs local[4N] (default N=8). Each level runs in a
fresh subprocess (fresh JVM, cold Python workers); throughput counts only
wave-processing wall time (session startup excluded on both sides
identically).

Measurement hygiene (this box shows 2-3x per-action wall noise):
  * input = the `scale` tier (~414k turns, 4x bench) so per-leg compute
    dominates fixed per-action overhead;
  * reps per level (default 3), alternating levels; per-level throughput
    is the MEDIAN rep;
  * single wave (wave_size = n_buckets) so checkpoint barriers don't
    serialize the measurement — resumability is proven separately in
    tests/test_resume_job.py.

    efficiency = (thr_4N / thr_N) / 4

Writes scaling_result.json (consumed by BENCH.md).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cpus: int, input_path: str, n_buckets: int, wave_size: int) -> dict:
    with tempfile.TemporaryDirectory(prefix=f"scale{cpus}_") as out:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "extract.py"),
             "--input", input_path, "--out", out, "--cpus", str(cpus),
             "--n-buckets", str(n_buckets), "--wave-size", str(wave_size)],
            capture_output=True, text=True, check=True, cwd=REPO)
        return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    tier = os.environ.get("SCALING_TIER", "scale")
    n = int(os.environ.get("SCALING_N", "8"))
    reps = int(os.environ.get("SCALING_REPS", "3"))
    n_buckets = int(os.environ.get("SCALING_BUCKETS", "32"))

    from ocr_image_to_text_spark.transcripts import ensure_transcripts
    input_path = ensure_transcripts(tier)  # outside all timing

    walls: dict[int, list[float]] = {n: [], 4 * n: []}
    n_turns = 0
    for rep in range(reps):
        for cpus in (n, 4 * n):
            s = run_level(cpus, input_path, n_buckets, n_buckets)
            walls[cpus].append(s["wall_s"])
            n_turns = s["n_turns"]
            print(f"rep{rep} local[{cpus}]: {s['wall_s']}s", file=sys.stderr)

    levels = {}
    for cpus, ws in walls.items():
        med = statistics.median(ws)
        levels[cpus] = {"wall_s_reps": ws, "wall_s_median": med,
                        "n_turns": n_turns,
                        "turns_per_sec": round(n_turns / med, 1)}

    eff = (levels[4 * n]["turns_per_sec"] / levels[n]["turns_per_sec"]) / 4
    result = {"tier": tier, "input": input_path, "N": n, "reps": reps,
              "levels": levels, "scaling_efficiency": round(eff, 3),
              "target": 0.8, "pass": eff >= 0.8}
    print(json.dumps(result))
    with open(os.path.join(REPO, "scaling_result.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
