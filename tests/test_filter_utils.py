"""§2.3 filter-math unit tests + bound-safety properties (no Ray needed)."""

import math
import random

import numpy as np
import pytest

from rayssj import filter_utils as fu


def test_prefix_length_jaccard():
    # n=10, t=0.8 -> ceil(8)=8 -> prefix 3
    assert fu.get_prefix_length(10, fu.JACCARD, 0.8) == 3
    assert fu.get_prefix_length(10, fu.JACCARD, 1.0) == 1
    assert fu.get_prefix_length(0, fu.JACCARD, 0.5) == 0


def test_prefix_length_vector():
    n = np.array([0, 1, 5, 10])
    p = fu.get_prefix_length(n, fu.COSINE, 0.7)
    assert p.tolist() == [0, 1, 3, 6]  # n - ceil(0.49 n) + 1 clipped


def test_overlap_threshold_formulas():
    assert fu.get_overlap_threshold(10, 10, fu.JACCARD, 0.5) == 7  # ceil(1/3*20)
    assert fu.get_overlap_threshold(9, 16, fu.COSINE, 0.5) == 6  # ceil(.5*12)
    assert fu.get_overlap_threshold(10, 10, fu.DICE, 0.8) == 8
    assert fu.get_overlap_threshold(4, 9, fu.OVERLAP_COEFFICIENT, 0.75) == 3
    assert fu.get_overlap_threshold(5, 9, fu.OVERLAP, 3) == 3


def test_size_bounds_monotone():
    for measure in fu.SET_SIM_MEASURES:
        for t in (0.3, 0.5, 0.8, 1.0):
            for n in range(0, 40):
                lb = fu.get_size_lower_bound(n, measure, t)
                ub = fu.get_size_upper_bound(n, measure, t)
                assert lb <= max(n, lb)  # sane
                if measure in (fu.JACCARD, fu.COSINE, fu.DICE) and n > 0:
                    assert lb <= n <= ub  # self always feasible


@pytest.mark.parametrize("measure", list(fu.SET_SIM_MEASURES))
def test_bounds_are_safe(measure):
    """Property: if sim(A,B) >= t then |B| within bounds of |A|, overlap >=
    overlap_threshold, and prefixes (by ANY global order) intersect."""
    rng = random.Random(42)
    universe = list(range(60))
    for trial in range(300):
        t = rng.choice([0.3, 0.5, 0.7, 0.8, 0.9])
        A = set(rng.sample(universe, rng.randint(1, 20)))
        B = set(rng.sample(universe, rng.randint(1, 20)))
        inter = len(A & B)
        sim = fu.SIM_FUNCTIONS[measure](A, B)
        if sim >= t:
            assert fu.get_size_lower_bound(len(A), measure, t) <= len(B)
            assert len(B) <= fu.get_size_upper_bound(len(A), measure, t)
            assert inter >= fu.get_overlap_threshold(len(A), len(B), measure, t)
            # prefix completeness under sorted-int "global order"
            pa_ = fu.get_prefix_length(len(A), measure, t)
            pb_ = fu.get_prefix_length(len(B), measure, t)
            Ao, Bo = sorted(A), sorted(B)
            if measure == fu.OVERLAP_COEFFICIENT:
                # only the SMALLER side's prefix is guaranteed to intersect
                # the other's FULL set (size ratio unbounded)
                small, p_small, big = ((Ao, pa_, B) if len(A) <= len(B)
                                       else (Bo, pb_, A))
                assert set(small[:p_small]) & big, (A, B, t, measure)
            else:
                assert set(Ao[:pa_]) & set(Bo[:pb_]), (A, B, t, measure)


def test_edit_distance_bounds():
    class Q:
        qval = 3

    assert fu.get_prefix_length(20, fu.EDIT_DISTANCE, 2, Q) == 7  # q*t+1
    assert fu.get_prefix_length(4, fu.EDIT_DISTANCE, 2, Q) == 4  # clipped
    assert fu.get_size_lower_bound(10, fu.EDIT_DISTANCE, 3) == 7
    assert fu.get_size_upper_bound(10, fu.EDIT_DISTANCE, 3) == 13


def test_compute_sim_matches_scalar_fns():
    rng = random.Random(7)
    for _ in range(200):
        A = set(rng.sample(range(30), rng.randint(0, 15)))
        B = set(rng.sample(range(30), rng.randint(0, 15)))
        o = len(A & B)
        for m in fu.SET_SIM_MEASURES:
            vec = float(fu.compute_sim(m, o, len(A), len(B)))
            ref = fu.SIM_FUNCTIONS[m](A, B)
            if len(A) == 0 and len(B) == 0:
                continue  # empty-empty handled by allow_empty path, not kernel
            assert math.isclose(vec, ref, abs_tol=1e-12), (m, A, B)


def test_comp_op_map():
    assert fu.COMP_OP_MAP[">="](0.5, 0.5)
    assert not fu.COMP_OP_MAP[">"](0.5, 0.5)
    assert fu.COMP_OP_MAP["<="](2, 3)
    assert fu.COMP_OP_MAP["="](1, 1)


def test_levenshtein_scalar():
    assert fu.levenshtein("", "") == 0
    assert fu.levenshtein("abc", "") == 3
    assert fu.levenshtein("kitten", "sitting") == 3
    assert fu.levenshtein("flaw", "lawn") == 2
