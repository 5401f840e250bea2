"""Memory-bandwidth ceiling microbench for the E2E scaling bar.

The e2e linkage job (ws-token blocking at t=0.9 → 150-300 M pair EMISSION →
edge shuffle → contraction) is dominated by Arrow table construction and
object-store block movement, i.e. memory bandwidth — unlike the q-gram
t=0.5 join matrix, whose cost is the verify kernel (CPU). On one box every
process shares one memory bus, so an emission-bound job's 8→32-process
scaling is capped by how aggregate copy bandwidth scales, NOT by CPU count;
on a real multi-node cluster each node brings its own bus, so per-node
throughput is the number that transfers. This probe pins the cap: K
processes each stream a 64 MiB read+write copy loop; report aggregate GB/s
at K=8 vs K=32 and the implied 8→32 scaling ceiling.

Usage:  python tools/membw_microbench.py            # full 8-vs-32 report
        python tools/membw_microbench.py --worker   # internal per-proc run
"""

from __future__ import annotations

import json
import subprocess
import sys

BUF_MB = 64
SECONDS = 4.0


def worker_run(seconds: float = SECONDS) -> dict:
    import time

    import numpy as np

    a = np.empty(BUF_MB * 1024 * 1024, dtype=np.uint8)
    b = np.empty_like(a)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(b, a)
        n += 1
    dt = time.perf_counter() - t0
    return {"gbps": round(n * a.nbytes * 2 / dt / 1e9, 2)}


def run_level(k: int) -> dict:
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker"],
        stdout=subprocess.PIPE, text=True) for _ in range(k)]
    agg = sum(json.loads(p.communicate()[0])["gbps"] for p in procs)
    return {"procs": k, "agg_gbps": round(agg, 1)}


def main():
    if "--worker" in sys.argv:
        print(json.dumps(worker_run()))
        return
    lo = run_level(8)
    hi = run_level(32)
    eff = (hi["agg_gbps"] / lo["agg_gbps"]) / (32 / 8)
    print(json.dumps({"workload": f"{BUF_MB}MiB stream copy (read+write)",
                      "at_8": lo, "at_32": hi,
                      "membw_scaling_ceiling": round(eff, 3)}))


if __name__ == "__main__":
    main()
