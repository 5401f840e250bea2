"""Pure filter math (SURVEY.md §2.3) — prefix lengths, size bounds, overlap
thresholds, and the PPJoin positional bound.

Semantics mirror the reference's ``utils/filter_utils.py``
[ref: py_stringsimjoin/utils/filter_utils.py:~10-120 †U]; re-derived from the
published prefix-filtering literature (Chaudhuri et al. SSJoin, Xiao et al.
PPJoin) and vectorized over numpy arrays. All functions accept scalars or
ndarrays of token-set sizes and broadcast.
"""

from __future__ import annotations

import math
import operator

import numpy as np

JACCARD = "JACCARD"
COSINE = "COSINE"
DICE = "DICE"
OVERLAP = "OVERLAP"
OVERLAP_COEFFICIENT = "OVERLAP_COEFFICIENT"
EDIT_DISTANCE = "EDIT_DISTANCE"

SET_SIM_MEASURES = (JACCARD, COSINE, DICE, OVERLAP_COEFFICIENT)

COMP_OP_MAP = {
    ">=": operator.ge,
    ">": operator.gt,
    "<=": operator.le,
    "<": operator.lt,
    "=": operator.eq,
    "!=": operator.ne,
}

_EPS = 1e-9  # guards float roundoff in ceil/floor of exact rationals


def _ceil(x):
    return np.ceil(np.asarray(x, dtype=np.float64) - _EPS).astype(np.int64)


def _floor(x):
    return np.floor(np.asarray(x, dtype=np.float64) + _EPS).astype(np.int64)


def get_prefix_length(num_tokens, sim_measure_type, threshold, tokenizer=None):
    """Prefix length for a record with ``num_tokens`` ordered tokens.

    For EDIT_DISTANCE, ``tokenizer`` must expose ``qval`` and ``num_tokens`` is
    the q-gram bag size; prefix = min(q*t + 1, num_tokens).
    """
    n = np.asarray(num_tokens, dtype=np.int64)
    t = float(threshold)
    if sim_measure_type == JACCARD:
        p = n - _ceil(t * n) + 1
    elif sim_measure_type == COSINE:
        p = n - _ceil(t * t * n) + 1
    elif sim_measure_type == DICE:
        p = n - _ceil(t / (2.0 - t) * n) + 1
    elif sim_measure_type == OVERLAP:
        p = n - int(t) + 1
    elif sim_measure_type == OVERLAP_COEFFICIENT:
        p = n - _ceil(t * n) + 1
    elif sim_measure_type == EDIT_DISTANCE:
        q = tokenizer.qval
        p = np.minimum(int(q * t + 1), n)
    else:
        raise AssertionError(f"unknown sim measure: {sim_measure_type}")
    p = np.clip(p, 0, n)
    if np.isscalar(num_tokens):
        return int(p)
    return p


def get_size_lower_bound(num_tokens, sim_measure_type, threshold):
    n = np.asarray(num_tokens, dtype=np.int64)
    t = float(threshold)
    if sim_measure_type == JACCARD:
        lb = _ceil(t * n)
    elif sim_measure_type == COSINE:
        lb = _ceil(t * t * n)
    elif sim_measure_type == DICE:
        lb = _ceil(t / (2.0 - t) * n)
    elif sim_measure_type == OVERLAP:
        lb = np.maximum(int(t), 1) + np.zeros_like(n)
    elif sim_measure_type == OVERLAP_COEFFICIENT:
        # OC's size ratio is unbounded (a 1-token subset of a huge set scores
        # 1.0); the only safe bound is non-emptiness when t > 0
        lb = np.full_like(n, 1 if t > 0 else 0)
    elif sim_measure_type == EDIT_DISTANCE:
        lb = n - int(t)
    else:
        raise AssertionError(f"unknown sim measure: {sim_measure_type}")
    lb = np.maximum(lb, 0)
    if np.isscalar(num_tokens):
        return int(lb)
    return lb


_INF = np.iinfo(np.int64).max // 2


def get_size_upper_bound(num_tokens, sim_measure_type, threshold):
    n = np.asarray(num_tokens, dtype=np.int64)
    t = float(threshold)
    if sim_measure_type == JACCARD:
        ub = _floor(n / t)
    elif sim_measure_type == COSINE:
        ub = _floor(n / (t * t))
    elif sim_measure_type == DICE:
        ub = _floor((2.0 - t) / t * n)
    elif sim_measure_type in (OVERLAP, OVERLAP_COEFFICIENT):
        ub = np.full_like(n, _INF)
    elif sim_measure_type == EDIT_DISTANCE:
        ub = n + int(t)
    else:
        raise AssertionError(f"unknown sim measure: {sim_measure_type}")
    if np.isscalar(num_tokens):
        return int(ub)
    return ub


def get_overlap_threshold(l_num_tokens, r_num_tokens, sim_measure_type, threshold,
                          tokenizer=None):
    """Minimum |A∩B| for the pair to possibly satisfy ``sim >= threshold``."""
    n1 = np.asarray(l_num_tokens, dtype=np.int64)
    n2 = np.asarray(r_num_tokens, dtype=np.int64)
    t = float(threshold)
    if sim_measure_type == JACCARD:
        o = _ceil(t / (1.0 + t) * (n1 + n2))
    elif sim_measure_type == COSINE:
        o = _ceil(t * np.sqrt(n1.astype(np.float64) * n2.astype(np.float64)))
    elif sim_measure_type == DICE:
        o = _ceil(t / 2.0 * (n1 + n2))
    elif sim_measure_type == OVERLAP:
        o = np.full(np.broadcast(n1, n2).shape, max(int(t), 1), dtype=np.int64)
    elif sim_measure_type == OVERLAP_COEFFICIENT:
        o = _ceil(t * np.minimum(n1, n2))
    elif sim_measure_type == EDIT_DISTANCE:
        q = tokenizer.qval
        o = np.maximum(n1, n2) - int(q * t)  # q-gram count filter (bag sizes)
    else:
        raise AssertionError(f"unknown sim measure: {sim_measure_type}")
    o = np.maximum(o, 1)
    if np.isscalar(l_num_tokens) and np.isscalar(r_num_tokens):
        return int(o)
    return o


def position_overlap_upper_bound(current_overlap, l_remaining, r_remaining):
    """PPJoin positional bound: best-case final overlap given overlap so far
    and tokens remaining after the current positions in each ordered list."""
    return current_overlap + np.minimum(l_remaining, r_remaining)


def compute_sim(sim_measure_type, overlap, l_size, r_size):
    """Vectorized similarity from overlap + set sizes (set measures only)."""
    o = np.asarray(overlap, dtype=np.float64)
    n1 = np.asarray(l_size, dtype=np.float64)
    n2 = np.asarray(r_size, dtype=np.float64)
    if sim_measure_type == JACCARD:
        denom = n1 + n2 - o
        return np.where(denom > 0, o / np.maximum(denom, 1), 0.0)
    if sim_measure_type == COSINE:
        denom = np.sqrt(n1 * n2)
        return np.where(denom > 0, o / np.maximum(denom, _EPS), 0.0)
    if sim_measure_type == DICE:
        denom = n1 + n2
        return np.where(denom > 0, 2.0 * o / np.maximum(denom, 1), 0.0)
    if sim_measure_type == OVERLAP:
        return o
    if sim_measure_type == OVERLAP_COEFFICIENT:
        denom = np.minimum(n1, n2)
        return np.where(denom > 0, o / np.maximum(denom, 1), 0.0)
    raise AssertionError(f"unknown sim measure: {sim_measure_type}")


# ---- scalar similarity functions over token lists (matcher UDF defaults) ----

def jaccard(l_tokens, r_tokens) -> float:
    a, b = set(l_tokens), set(r_tokens)
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def cosine(l_tokens, r_tokens) -> float:
    a, b = set(l_tokens), set(r_tokens)
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / math.sqrt(len(a) * len(b))


def dice(l_tokens, r_tokens) -> float:
    a, b = set(l_tokens), set(r_tokens)
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return 2 * len(a & b) / (len(a) + len(b))


def overlap(l_tokens, r_tokens) -> float:
    return float(len(set(l_tokens) & set(r_tokens)))


def overlap_coefficient(l_tokens, r_tokens) -> float:
    a, b = set(l_tokens), set(r_tokens)
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / min(len(a), len(b))


def levenshtein(s: str, t: str) -> int:
    """Scalar unit-cost Levenshtein (oracle/tests; the join uses the banded
    numpy kernel in rayssj.levenshtein)."""
    if s == t:
        return 0
    if not s:
        return len(t)
    if not t:
        return len(s)
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i] + [0] * len(t)
        for j, ct in enumerate(t, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct))
        prev = cur
    return prev[-1]


SIM_FUNCTIONS = {
    JACCARD: jaccard,
    COSINE: cosine,
    DICE: dice,
    OVERLAP: overlap,
    OVERLAP_COEFFICIENT: overlap_coefficient,
}
