#!/usr/bin/env python
"""Two-parallelism scaling-efficiency harness (north_rule evidence).

The rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so the sanctioned
stand-in is the same spark-submit job at two parallelism levels on the
same input: local[N] vs local[4N] (default N=8), each in a fresh
subprocess (fresh JVM + cold Python workers on both sides).

Measurement hygiene — this sandbox runs on a CREDIT-THROTTLED host:
sustained load is throttled to a fraction of burst speed and recovers
after idle (measured 89 vs 164 Mops/s on an identical CPU probe). A long
high-parallelism leg therefore drains credits mid-run and *looks* like
anti-scaling. Countermeasures:

  * short legs (bench tier, ~103k turns) that fit inside the burst budget;
  * a fixed idle cool-down before every run;
  * per-level statistic = MIN wall across reps (the least-throttled run —
    medians under throttling measure the host's credit budget, not the
    job);
  * levels alternate so residual throttle hits both symmetrically.

    efficiency = (thr_4N / thr_N) / 4

Writes scaling_result.json (consumed by BENCH.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cpus: int, input_path: str, n_buckets: int, wave_size: int) -> dict:
    """One leg, pinned to exactly `cpus` host CPUs via taskset.

    Without pinning, a local[N] leg silently uses more than N cores — the
    Python UDF workers and JVM GC/shuffle threads run beside the N task
    slots — which inflates the small leg and corrupts the N-vs-4N ratio
    (measured: an unpinned local[2] out-throughput-ed local[8] per slot).
    Pinning the whole process tree makes "N" mean N cores, like an
    executor's cgroup on a real cluster."""
    with tempfile.TemporaryDirectory(prefix=f"scale{cpus}_") as out:
        p = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}",
             sys.executable, os.path.join(REPO, "jobs", "extract.py"),
             "--input", input_path, "--out", out, "--cpus", str(cpus),
             "--n-buckets", str(n_buckets), "--wave-size", str(wave_size)],
            capture_output=True, text=True, check=True, cwd=REPO)
        return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    tier = os.environ.get("SCALING_TIER", "scale")
    n = int(os.environ.get("SCALING_N", "8"))
    reps = int(os.environ.get("SCALING_REPS", "3"))
    n_buckets = int(os.environ.get("SCALING_BUCKETS", "32"))
    cooldown = int(os.environ.get("SCALING_COOLDOWN_S", "150"))

    from ocr_image_to_text_spark.transcripts import ensure_transcripts
    input_path = ensure_transcripts(tier)  # outside all timing

    walls: dict[int, list[float]] = {n: [], 4 * n: []}
    n_turns = 0
    for rep in range(reps):
        for cpus in (4 * n, n):  # big leg first within each rep
            time.sleep(cooldown)
            s = run_level(cpus, input_path, n_buckets, n_buckets)
            walls[cpus].append(s["wall_s"])
            n_turns = s["n_turns"]
            print(f"rep{rep} local[{cpus}]: {s['wall_s']}s", file=sys.stderr,
                  flush=True)

    levels = {}
    for cpus, ws in walls.items():
        best = min(ws)
        levels[cpus] = {"wall_s_reps": ws, "wall_s_min": best,
                        "n_turns": n_turns,
                        "turns_per_sec": round(n_turns / best, 1)}

    eff = (levels[4 * n]["turns_per_sec"] / levels[n]["turns_per_sec"]) / 4
    result = {"tier": tier, "input": input_path, "N": n, "reps": reps,
              "cooldown_s": cooldown, "statistic": "min-of-reps",
              "levels": levels, "scaling_efficiency": round(eff, 3),
              "target": 0.8, "pass": eff >= 0.8}
    print(json.dumps(result))
    with open(os.path.join(REPO, "scaling_result.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
