"""Bit-packed fused verification kernel (optional native fast path).

The set-sim / edit-distance bucket kernels verify candidate tiles with two
float32 membership GEMMs plus an ot/bound/mask numpy chain
(``rayssj/kernels.py``). At 32-way process concurrency that chain is
DRAM-bandwidth bound: the GEMM operands (n x |vocab| float32) and the per-tile
int/bool temporaries stream from memory, and 8->32 scaling efficiency measured
0.60-0.66 (BASELINE.md round-3 matrices).

This module packs each member's token-membership row into ``ceil(V/64)``
uint64 words (32x smaller than float32) and fuses the whole per-tile chain —
feasibility bound, triangular dedup, prefix AND-any dedup test, overlap
AND-popcount count, threshold test — into ONE C pass that writes only the
survivor mask (1 byte/cell) and survivor counts. Operands stay L2-resident
even at 32 concurrent workers; there are no per-tile numpy temporaries at all.

The C source below is compiled ONCE per node with the system gcc into a
content-hashed ``.so`` under ``$RAYSSJ_NATIVE_DIR`` (default
``/tmp/rayssj_native``) and loaded via ctypes; concurrent workers race safely
on an atomic rename. If no compiler is available (or ``RAYSSJ_NATIVE=0``),
``available()`` is False and callers keep the pure-numpy GEMM path — results
are bit-identical either way (the overlap-threshold values are taken from the
same python LUT in both paths).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>

static inline int64_t pop_and(const uint64_t* a, const uint64_t* b, int64_t w) {
    int64_t c = 0;
    for (int64_t k = 0; k < w; k++)
        c += __builtin_popcountll(a[k] & b[k]);
    return c;
}

static inline int any_and(const uint64_t* a, const uint64_t* b, int64_t w) {
    uint64_t acc = 0;
    for (int64_t k = 0; k < w; k++)
        acc |= a[k] & b[k];
    return acc != 0;
}

/* Fused tile verification.
 *
 * AP/BP: prefix bitsets, WP words/row (WP==0 -> skip the prefix-dedup test).
 * AF/BF: full-set bitsets, WF words/row (WF==0 -> skip the overlap test).
 * n1v/n2v: per-row/col token-set sizes (overlap-threshold LUT index).
 * b1v/b2v: per-row/col feasibility bounds.
 * lut/mode/c0: overlap threshold t per pair:
 *     mode 0: t = lut[n1v[i] + n2v[j]]          (JACCARD / DICE sum domain)
 *     mode 1: t = lut[0]                        (scalar, e.g. OVERLAP)
 *     mode 2: t = lut[n1v[i] * n2v[j]]          (COSINE product domain)
 *     mode 3: t = max(n1v[i], n2v[j]) - c0      (edit-distance gram bound)
 * feas/c1:
 *     feas 0: require min(b1v[i], b2v[j]) >= t  (set-sim fused size+pos bound)
 *     feas 1: require |b1v[i] - b2v[j]| <= c1   (edit-distance length filter)
 *     feas 2: no feasibility test
 * triu/ioff/joff: when triu != 0 require (ioff + i) < (joff + j)
 *     (self-join upper-triangle rule in the cell's sorted coordinates).
 *
 * mask (n1*n2 uint8) is written from scratch: 1 for survivors.
 * counts (n1*n2 int32, may be NULL) receives the exact overlap for survivors.
 */
void ssj_verify_tile(
    const uint64_t* AP, const uint64_t* BP, int64_t WP,
    const uint64_t* AF, const uint64_t* BF, int64_t WF,
    int64_t n1, int64_t n2,
    const int32_t* n1v, const int32_t* n2v,
    const int32_t* b1v, const int32_t* b2v,
    const int32_t* lut, int32_t mode, int32_t c0,
    int32_t feas, int32_t c1,
    int32_t triu, int64_t ioff, int64_t joff,
    uint8_t* mask, int32_t* counts)
{
    for (int64_t i = 0; i < n1; i++) {
        const uint64_t* ap = AP + i * WP;
        const uint64_t* af = AF + i * WF;
        uint8_t* mrow = mask + i * n2;
        int32_t* crow = counts ? counts + i * n2 : 0;
        int32_t s1 = n1v[i];
        int32_t f1 = b1v[i];
        int64_t jmin = 0;
        if (triu) {
            int64_t d = ioff + i + 1 - joff;
            if (d > 0) jmin = d;
        }
        for (int64_t j = 0; j < n2; j++) mrow[j] = 0;
        for (int64_t j = jmin; j < n2; j++) {
            int32_t s2 = n2v[j];
            int32_t t;
            if (mode == 0)      t = lut[s1 + s2];
            else if (mode == 1) t = lut[0];
            else if (mode == 2) t = lut[(int64_t)s1 * (int64_t)s2];
            else {
                int32_t mx = s1 > s2 ? s1 : s2;
                t = mx - c0;
            }
            if (feas == 0) {
                int32_t f2 = b2v[j];
                int32_t mn = f1 < f2 ? f1 : f2;
                if (mn < t) continue;
            } else if (feas == 1) {
                int32_t d = f1 - b2v[j];
                if (d < 0) d = -d;
                if (d > c1) continue;
            }
            if (WP && any_and(ap, BP + j * WP, WP)) continue;
            if (WF) {
                int64_t c = pop_and(af, BF + j * WF, WF);
                if (c < t) continue;
                if (crow) crow[j] = (int32_t)c;
            }
            mrow[j] = 1;
        }
    }
}

/* Same verification as ssj_verify_tile, but emits survivor (i, j, count)
 * triples compactly instead of a dense mask: removes the per-tile mask
 * write + nonzero scan entirely (the only remaining DRAM traffic is the
 * survivors themselves). Returns the number of survivors written. The out
 * buffers must have capacity n1*n2 (numpy lazy pages make that free). */
int64_t ssj_verify_emit(
    const uint64_t* AP, const uint64_t* BP, int64_t WP,
    const uint64_t* AF, const uint64_t* BF, int64_t WF,
    int64_t n1, int64_t n2,
    const int32_t* n1v, const int32_t* n2v,
    const int32_t* b1v, const int32_t* b2v,
    const int32_t* lut, int32_t mode, int32_t c0,
    int32_t feas, int32_t c1,
    int32_t triu, int64_t ioff, int64_t joff,
    int32_t* out_i, int32_t* out_j, int32_t* out_c)
{
    int64_t n = 0;
    for (int64_t i = 0; i < n1; i++) {
        const uint64_t* ap = AP + i * WP;
        const uint64_t* af = AF + i * WF;
        int32_t s1 = n1v[i];
        int32_t f1 = b1v[i];
        int64_t jmin = 0;
        if (triu) {
            int64_t d = ioff + i + 1 - joff;
            if (d > 0) jmin = d;
        }
        for (int64_t j = jmin; j < n2; j++) {
            int32_t s2 = n2v[j];
            int32_t t;
            if (mode == 0)      t = lut[s1 + s2];
            else if (mode == 1) t = lut[0];
            else if (mode == 2) t = lut[(int64_t)s1 * (int64_t)s2];
            else {
                int32_t mx = s1 > s2 ? s1 : s2;
                t = mx - c0;
            }
            if (feas == 0) {
                int32_t f2 = b2v[j];
                int32_t mn = f1 < f2 ? f1 : f2;
                if (mn < t) continue;
            } else if (feas == 1) {
                int32_t d = f1 - b2v[j];
                if (d < 0) d = -d;
                if (d > c1) continue;
            }
            if (WP && any_and(ap, BP + j * WP, WP)) continue;
            int64_t c = 0;
            if (WF) {
                c = pop_and(af, BF + j * WF, WF);
                if (c < t) continue;
            }
            out_i[n] = (int32_t)i;
            out_j[n] = (int32_t)j;
            out_c[n] = (int32_t)c;
            n++;
        }
    }
    return n;
}
"""

_FLAG_SETS = (
    ["-O3", "-march=native", "-funroll-loops"],
    ["-O3", "-mpopcnt", "-funroll-loops"],
    ["-O3"],
)

_lib = None
_tried = False


def _build_and_load():
    cache_dir = os.environ.get(
        "RAYSSJ_NATIVE_DIR", os.path.join(tempfile.gettempdir(), "rayssj_native"))
    os.makedirs(cache_dir, exist_ok=True)
    h = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
    so_path = os.path.join(cache_dir, f"libssj_{h}.so")
    if not os.path.exists(so_path):
        src_path = os.path.join(cache_dir, f"ssj_{h}_{os.getpid()}.c")
        with open(src_path, "w") as f:
            f.write(_C_SRC)
        tmp_so = so_path + f".{os.getpid()}.tmp"
        built = False
        for flags in _FLAG_SETS:
            cmd = ["gcc", "-shared", "-fPIC", *flags, src_path, "-o", tmp_so]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                built = True
                break
            except Exception:
                continue
        try:
            os.unlink(src_path)
        except OSError:
            pass
        if not built:
            return None
        os.rename(tmp_so, so_path)  # atomic: concurrent workers race safely
    lib = ctypes.CDLL(so_path)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    lib.ssj_verify_tile.argtypes = [
        u64p, u64p, i64, u64p, u64p, i64,
        i64, i64, i32p, i32p, i32p, i32p,
        i32p, i32, i32, i32, i32, i32, i64, i64,
        u8p, i32p,
    ]
    lib.ssj_verify_tile.restype = None
    lib.ssj_verify_emit.argtypes = [
        u64p, u64p, i64, u64p, u64p, i64,
        i64, i64, i32p, i32p, i32p, i32p,
        i32p, i32, i32, i32, i32, i32, i64, i64,
        i32p, i32p, i32p,
    ]
    lib.ssj_verify_emit.restype = i64
    return lib


def available() -> bool:
    global _lib, _tried
    if not _tried:
        _tried = True
        if os.environ.get("RAYSSJ_NATIVE", "1") != "0":
            try:
                _lib = _build_and_load()
            except Exception:
                _lib = None
    return _lib is not None


def pack_bits(dense_u8: np.ndarray) -> np.ndarray:
    """Pack a (n, V) 0/1 uint8 membership matrix into (n, ceil(V/64)) uint64.

    Bit order is arbitrary but identical for both operands, which is all the
    AND-any / AND-popcount tests need.
    """
    n, v = dense_u8.shape
    if v == 0:
        return np.zeros((n, 0), dtype=np.uint64)
    packed = np.packbits(dense_u8, axis=1)  # (n, ceil(v/8)) uint8
    pad = (-packed.shape[1]) % 8
    if pad:
        packed = np.concatenate(
            [packed, np.zeros((n, pad), dtype=np.uint8)], axis=1)
    return np.ascontiguousarray(packed).view(np.uint64)


_EMPTY_U64 = np.zeros((1, 0), dtype=np.uint64)
_EMPTY_I32 = np.zeros(1, dtype=np.int32)


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def verify_tile(AP, BP, AF, BF, n1v, n2v, b1v, b2v, lut, mode, c0,
                feas, c1, triu, ioff, joff, want_counts=True):
    """Run the fused tile kernel; returns (mask bool (n1,n2), counts|None).

    All int vector args must be int32 1-D; AP/BP/AF/BF uint64 2-D C-contiguous
    (pass None to skip the prefix or overlap stage).
    """
    n1 = len(n1v)
    n2 = len(n2v)
    ap = AP if AP is not None else _EMPTY_U64
    bp = BP if BP is not None else _EMPTY_U64
    af = AF if AF is not None else _EMPTY_U64
    bf = BF if BF is not None else _EMPTY_U64
    wp = ap.shape[1] if AP is not None else 0
    wf = af.shape[1] if AF is not None else 0
    lut = lut if lut is not None else _EMPTY_I32
    mask = np.empty((n1, n2), dtype=np.uint8)
    counts = np.empty((n1, n2), dtype=np.int32) if (want_counts and wf) else None
    _lib.ssj_verify_tile(
        _p(ap, ctypes.c_uint64), _p(bp, ctypes.c_uint64), wp,
        _p(af, ctypes.c_uint64), _p(bf, ctypes.c_uint64), wf,
        n1, n2,
        _p(n1v, ctypes.c_int32), _p(n2v, ctypes.c_int32),
        _p(b1v, ctypes.c_int32), _p(b2v, ctypes.c_int32),
        _p(lut, ctypes.c_int32), mode, c0, feas, c1,
        1 if triu else 0, ioff, joff,
        _p(mask, ctypes.c_uint8),
        _p(counts, ctypes.c_int32) if counts is not None else None,
    )
    return mask.view(np.bool_), counts


def verify_emit(AP, BP, AF, BF, n1v, n2v, b1v, b2v, lut, mode, c0,
                feas, c1, triu, ioff, joff):
    """Fused tile verification emitting compact survivors.

    Returns (ii, jj, counts) int32 arrays of tile-local survivor coordinates
    and exact overlap counts (counts are 0 when the overlap stage is skipped).
    """
    n1 = len(n1v)
    n2 = len(n2v)
    ap = AP if AP is not None else _EMPTY_U64
    bp = BP if BP is not None else _EMPTY_U64
    af = AF if AF is not None else _EMPTY_U64
    bf = BF if BF is not None else _EMPTY_U64
    wp = ap.shape[1] if AP is not None else 0
    wf = af.shape[1] if AF is not None else 0
    lut = lut if lut is not None else _EMPTY_I32
    cap = n1 * n2
    out_i = np.empty(cap, dtype=np.int32)   # lazy pages: survivors-only commit
    out_j = np.empty(cap, dtype=np.int32)
    out_c = np.empty(cap, dtype=np.int32)
    n = _lib.ssj_verify_emit(
        _p(ap, ctypes.c_uint64), _p(bp, ctypes.c_uint64), wp,
        _p(af, ctypes.c_uint64), _p(bf, ctypes.c_uint64), wf,
        n1, n2,
        _p(n1v, ctypes.c_int32), _p(n2v, ctypes.c_int32),
        _p(b1v, ctypes.c_int32), _p(b2v, ctypes.c_int32),
        _p(lut, ctypes.c_int32), mode, c0, feas, c1,
        1 if triu else 0, ioff, joff,
        _p(out_i, ctypes.c_int32), _p(out_j, ctypes.c_int32),
        _p(out_c, ctypes.c_int32),
    )
    return out_i[:n], out_j[:n], out_c[:n]
