"""Native bit-packed kernel A/B equivalence (rayssj/native.py).

The fused C tile kernel must produce bit-identical join/filter output to the
pure-numpy GEMM path it replaces — both derive overlap thresholds from the
same python LUT, so any divergence is a bug, not float noise. Tables here use
a small zipf-ish vocabulary so prefix-token groups exceed _MATRIX_GROUP_MIN
and the big-group (tiled) paths actually run.
"""

import random

import numpy as np
import pandas as pd
import pytest

import rayssj.kernels as K
from rayssj import (
    PrefixFilter,
    QgramTokenizer,
    WhitespaceTokenizer,
    cosine_join,
    dice_join,
    edit_distance_join,
    jaccard_join,
    overlap_join,
)
from rayssj import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C compiler for the native fast path")

JOINS = {"jaccard": (jaccard_join, 0.5), "cosine": (cosine_join, 0.6),
         "dice": (dice_join, 0.6), "overlap": (overlap_join, 3)}


def skewed_tables(seed=7, n_a=160, n_b=150):
    # 12-word vocab + zipf weights -> every prefix token heads a big group
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta",
             "eta", "theta", "iota", "kappa", "lam", "mu"]
    wts = [1.0 / (i + 1) for i in range(len(words))]

    def txt():
        return " ".join(rng.choices(words, weights=wts,
                                    k=rng.randint(2, 8)))

    A = pd.DataFrame({"ID": [f"a{i}" for i in range(n_a)],
                      "name": [txt() for _ in range(n_a)]})
    B = pd.DataFrame({"ID": [f"b{i}" for i in range(n_b)],
                      "name": [txt() for _ in range(n_b)]})
    return A, B


def canon(df):
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def ab(monkeypatch, fn):
    monkeypatch.setattr(K, "NATIVE_ENABLED", True)
    with_native = canon(fn())
    monkeypatch.setattr(K, "NATIVE_ENABLED", False)
    without = canon(fn())
    return with_native, without


@pytest.mark.parametrize("measure", list(JOINS))
def test_set_sim_join_native_ab(measure, monkeypatch):
    A, B = skewed_tables()
    join, t = JOINS[measure]
    tok = WhitespaceTokenizer(return_set=True)

    def run():
        return join(A, B, "ID", "ID", "name", "name", tok, t).to_pandas()

    got, exp = ab(monkeypatch, run)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0


def test_set_sim_self_join_native_ab(monkeypatch):
    A, _ = skewed_tables(seed=13, n_a=200)

    def run():
        tok = WhitespaceTokenizer(return_set=True)
        return jaccard_join(A, A, "ID", "ID", "name", "name",
                            tok, 0.55).to_pandas()

    got, exp = ab(monkeypatch, run)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > len(A)  # diagonal plus real matches


def test_edit_distance_join_native_ab(monkeypatch):
    rng = random.Random(3)
    base = ["database", "databse", "mining", "minings", "stream",
            "striam", "vector", "vectors", "raycore", "raycare"]
    vals = [rng.choice(base) + rng.choice(["", "x", "xy"]) for _ in range(180)]
    A = pd.DataFrame({"ID": [f"a{i}" for i in range(len(vals))], "name": vals})

    def run():
        return edit_distance_join(A, A, "ID", "ID", "name", "name",
                                  QgramTokenizer(2), 2).to_pandas()

    got, exp = ab(monkeypatch, run)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0


def test_prefix_filter_native_ab(monkeypatch):
    A, B = skewed_tables(seed=29)

    def run():
        f = PrefixFilter(WhitespaceTokenizer(return_set=True), "JACCARD", 0.4)
        return f.filter_tables(A, B, "ID", "ID", "name", "name").to_pandas()

    got, exp = ab(monkeypatch, run)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0


def test_verify_emit_matches_numpy_popcount():
    # direct unit check of the C kernel against a numpy reimplementation
    rng = np.random.default_rng(42)
    n1, n2, V = 37, 53, 300
    A = (rng.random((n1, V)) < 0.15).astype(np.uint8)
    B = (rng.random((n2, V)) < 0.15).astype(np.uint8)
    Ap, Bp = native.pack_bits(A), native.pack_bits(B)
    n1v = A.sum(axis=1).astype(np.int32)
    n2v = B.sum(axis=1).astype(np.int32)
    s = np.arange(int(n1v.max()) + int(n2v.max()) + 1, dtype=np.int64)
    lut = np.maximum(np.ceil(0.3 / 1.3 * s).astype(np.int32), 1)
    ii, jj, cc = native.verify_emit(None, None, Ap, Bp, n1v, n2v, n1v, n2v,
                                    lut, 0, 0, 0, 0, False, 0, 0)
    ov = (A.astype(np.int32) @ B.astype(np.int32).T)
    t = lut[n1v[:, None] + n2v[None, :]]
    feas = np.minimum(n1v[:, None], n2v[None, :]) >= t
    exp_mask = feas & (ov >= t)
    ei, ej = np.nonzero(exp_mask)
    assert np.array_equal(np.c_[ii, jj], np.c_[ei, ej])
    assert np.array_equal(cc, ov[ei, ej])
