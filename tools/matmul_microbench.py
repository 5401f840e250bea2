"""Hardware-ceiling microbench for the scaling-efficiency bar.

Runs the set-sim kernel's inner workload (float32 membership GEMM + int/bool
mask chain + nonzero emission, same shapes as the q3/t=0.5 scaling job) in K
independent OS processes and reports aggregate throughput at K=8 vs K=32.
This pins what 8->32 process scaling THIS HOST can physically deliver for the
kernel's instruction mix, independent of Ray — the efficiency number printed
here is the hardware ceiling the Ray pipeline is graded against.

Usage:  python tools/matmul_microbench.py            # full 8-vs-32 report
        python tools/matmul_microbench.py --impl native   # bit-packed C path
        python tools/matmul_microbench.py --worker N # internal per-proc run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Shapes mirror rayssj/kernels.py: _PAIR_CHUNK_ROWS=512 l-rows, full r-width
# (the scaling job's big cells have ~1-4k members, local vocab ~460 q-grams).
L_ROWS = 512
R_ROWS = 2048
VOCAB = 460
REPS_PER_TIMING = 40


def worker_run(seconds: float = 6.0, impl: str = "gemm") -> dict:
    os.environ.setdefault("OMP_NUM_THREADS", "1")  # Ray workers are 1-thread
    import numpy as np

    rng = np.random.default_rng(0)
    P = (rng.random((R_ROWS, VOCAB)) < 0.12).astype(np.float32)
    M = (rng.random((R_ROWS, VOCAB)) < 0.35).astype(np.float32)
    n1 = rng.integers(80, 400, (L_ROWS, 1)).astype(np.int32)
    n2 = rng.integers(80, 400, (1, R_ROWS)).astype(np.int32)
    ot = np.maximum((0.5 / 1.5 * (n1 + n2)).astype(np.int32), 1)
    if impl == "native":
        import sys as _sys
        _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from rayssj import native
        assert native.available()
        Pp = native.pack_bits(P.astype(np.uint8))
        Mp = native.pack_bits(M.astype(np.uint8))
        n1v = n1.ravel().copy()
        n2v = n2.ravel().copy()
        s = np.arange(int(n1v.max()) + int(n2v.max()) + 1, dtype=np.int64)
        lut = np.maximum((0.5 / 1.5 * s).astype(np.int32), 1)
    t0 = time.perf_counter()
    iters = 0
    sink = 0
    while time.perf_counter() - t0 < seconds:
        for _ in range(REPS_PER_TIMING):
            if impl == "native":
                ii, jj, cc = native.verify_emit(
                    Pp[:L_ROWS], Pp, Mp[:L_ROWS], Mp, n1v[:L_ROWS], n2v,
                    n1v[:L_ROWS], n2v, lut, 0, 0, 0, 0, False, 0, 0)
            else:
                mask = np.minimum(n1, n2) >= ot
                before = P[:L_ROWS] @ P.T
                mask &= before == 0
                F = M[:L_ROWS] @ M.T
                mask &= F >= ot
                ii, jj = np.nonzero(mask)
            sink += len(ii)
            iters += 1
    dt = time.perf_counter() - t0
    # one iter = 2 GEMMs of (L_ROWS x VOCAB) @ (VOCAB x R_ROWS) (work-equivalent
    # for the native impl: same logical tile verified per iter)
    flops = iters * 2 * 2.0 * L_ROWS * R_ROWS * VOCAB
    return {"iters": iters, "sec": round(dt, 3),
            "gflops": round(flops / dt / 1e9, 2), "sink": int(sink)}


def run_level(k: int, impl: str) -> dict:
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", "--impl", impl],
        stdout=subprocess.PIPE, text=True) for _ in range(k)]
    outs = [json.loads(p.communicate()[0]) for p in procs]
    agg = sum(o["gflops"] for o in outs)
    return {"procs": k, "agg_gflops": round(agg, 1),
            "per_proc_gflops": round(agg / k, 2)}


def main():
    impl = "gemm"
    if "--impl" in sys.argv:
        impl = sys.argv[sys.argv.index("--impl") + 1]
    seconds = 6.0
    if "--seconds" in sys.argv:
        seconds = float(sys.argv[sys.argv.index("--seconds") + 1])
    if "--worker" in sys.argv:
        print(json.dumps(worker_run(seconds=seconds, impl=impl)))
        return
    lo = run_level(8, impl)
    hi = run_level(32, impl)
    eff = (hi["agg_gflops"] / lo["agg_gflops"]) / (32 / 8)
    print(json.dumps({"workload": f"kernel-mix {impl} (512x460 @ 460x2048)",
                      "at_8": lo, "at_32": hi,
                      "hardware_scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
