"""Vectorized Levenshtein distance over BATCHES of string pairs.

The reference verifies edit-distance candidates one pair at a time in a Cython
loop [ref: py_stringsimjoin/join/edit_distance_join_py.py †U]. Here the DP is
vectorized ACROSS pairs: all pairs in a batch advance one DP column per step,
each step a handful of numpy ops over a (num_pairs, max_len+1) matrix — the
per-pair Python overhead is amortized away. Used by the edit-distance join's
verification stage and by apply_matcher's default edit-distance scorer.
"""

from __future__ import annotations

import numpy as np

_L_PAD = 0xFFFFFFFF  # sentinels: padded cells never match each other
_R_PAD = 0xFFFFFFFE


def _encode(strings, pad) -> tuple[np.ndarray, np.ndarray]:
    """list[str] → (P, max_len) uint32 code-point matrix + lengths."""
    lens = np.array([len(s) for s in strings], dtype=np.int64)
    m = int(lens.max()) if len(lens) else 0
    mat = np.full((len(strings), m), pad, dtype=np.uint32)
    if m:
        big = "".join(strings)
        cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
        starts = np.zeros(len(strings), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        cols = np.arange(m, dtype=np.int64)
        mask = cols[None, :] < lens[:, None]
        idx = starts[:, None] + cols[None, :]
        mat[mask] = cp[np.minimum(idx, len(cp) - 1)[mask]]
    return mat, lens


def levenshtein_pairs(l_strings, r_strings) -> np.ndarray:
    """Exact unit-cost Levenshtein for each aligned pair. Returns int64 array."""
    P = len(l_strings)
    assert P == len(r_strings)
    if P == 0:
        return np.array([], dtype=np.int64)
    L, lenL = _encode(list(l_strings), _L_PAD)
    R, lenR = _encode(list(r_strings), _R_PAD)
    mL, mR = L.shape[1], R.shape[1]
    out = np.empty(P, dtype=np.int64)
    # dp[p, i] = distance(l[:i], r[:j]) after processing column j
    dp = np.broadcast_to(np.arange(mL + 1, dtype=np.int64), (P, mL + 1)).copy()
    done = lenR == 0
    out[done] = lenL[done]
    for j in range(1, mR + 1):
        prev = dp
        dp = np.empty_like(prev)
        dp[:, 0] = j
        sub = prev[:, :-1] + (L != R[:, j - 1][:, None])
        dele = prev[:, 1:] + 1
        np.minimum(sub, dele, out=sub)
        # insertions need a sequential scan; do it with a log-step min-plus pass
        dp[:, 1:] = sub
        _prefix_min_plus(dp)
        fin = lenR == j
        if fin.any():
            out[fin] = dp[fin, lenL[fin]]
    return out


def _prefix_min_plus(dp: np.ndarray) -> None:
    """In-place dp[i] = min_k<=i (dp[k] + (i-k)) per row — resolves the
    insertion recurrence without a per-cell Python loop (doubling trick)."""
    n = dp.shape[1]
    shift = 1
    while shift < n:
        np.minimum(dp[:, shift:], dp[:, :-shift] + shift, out=dp[:, shift:])
        shift *= 2


def levenshtein_pairs_capped(l_strings, r_strings, max_dist: int) -> np.ndarray:
    """Levenshtein with early length-difference screening: pairs whose length
    gap exceeds max_dist short-circuit to max_dist+1 (no DP work)."""
    l_strings, r_strings = list(l_strings), list(r_strings)
    lenL = np.array([len(s) for s in l_strings], dtype=np.int64)
    lenR = np.array([len(s) for s in r_strings], dtype=np.int64)
    out = np.full(len(l_strings), max_dist + 1, dtype=np.int64)
    todo = np.abs(lenL - lenR) <= max_dist
    if todo.any():
        idx = np.nonzero(todo)[0]
        out[idx] = levenshtein_pairs([l_strings[i] for i in idx],
                                     [r_strings[i] for i in idx])
    return out
