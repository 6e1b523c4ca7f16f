#!/usr/bin/env python
"""Host-throttle characterization probe (evidence for BENCH.md).

Measures raw multiprocessing arithmetic throughput at several process
counts, twice: immediately, and after an idle window. On a burstable
(credit-throttled) host the two disagree and the second run is faster —
which is what this sandbox shows (89 vs 164 Mops/s at 16 procs).

Usage: python tools/throttle_probe.py [idle_seconds=120]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def sweep(tag: str) -> dict[int, float]:
    out = {}
    for procs in (1, 2, 8, 16, 32):
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(_burn, [5_000_000] * procs * 3)
            dt = time.perf_counter() - t0
        out[procs] = procs * 3 * 5.0 / dt  # Mops/s
        print(f"{tag} procs={procs:2d}: {out[procs]:6.1f} Mops/s", flush=True)
    return out


def main() -> None:
    idle = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    a = sweep("immediate")
    print(f"-- idling {idle}s --", flush=True)
    time.sleep(idle)
    b = sweep("after-idle")
    print("\nratios (after-idle / immediate):")
    for k in a:
        print(f"  procs={k:2d}: {b[k] / a[k]:.2f}x")
    print("\nscaling efficiency 8->32 (after-idle, burst):",
          round(b[32] / b[8] / 4, 2))


if __name__ == "__main__":
    main()
