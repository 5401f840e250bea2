"""Salting-grid correctness: with SALT_TARGET forced tiny, every token group
splits into s×s cells — outputs must be identical to the unsalted oracle
(cell decomposition covers each pair exactly once)."""

import numpy as np
import pandas as pd
import pytest

import rayssj.joins as J
from rayssj import (
    QgramTokenizer,
    WhitespaceTokenizer,
    edit_distance_join,
    jaccard_join,
    overlap_coefficient_join,
)
from rayssj import filter_utils as fu

from .oracle import edit_distance_join_oracle, result_pair_set, set_sim_join_oracle
from .test_joins import make_tables


@pytest.fixture()
def tiny_salt(monkeypatch):
    # every token with df > 4 gets salted, up to the 16-cell cap
    monkeypatch.setattr(J, "SALT_TARGET", 4)
    yield


def test_salted_jaccard_self_join(tiny_salt):
    A, _ = make_tables(seed=71, n_a=80)
    tok = WhitespaceTokenizer()
    out = jaccard_join(A, None, "ID", "ID", "name", "name", tok, 0.5,
                       self_join=True, salt_target=4).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = set_sim_join_oracle(A, None, "ID", "ID", "name", "name", tok,
                              fu.JACCARD, 0.5, self_join=True)
    assert got == exp


def test_salted_two_table_join(tiny_salt):
    A, B = make_tables(seed=73)
    tok = WhitespaceTokenizer()
    out = jaccard_join(A, B, "ID", "ID", "name", "name", tok, 0.5,
                       salt_target=4).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = set_sim_join_oracle(A, B, "ID", "ID", "name", "name", tok,
                              fu.JACCARD, 0.5)
    assert got == exp


def test_salted_overlap_coefficient(tiny_salt):
    A, B = make_tables(seed=79)
    tok = WhitespaceTokenizer()
    out = overlap_coefficient_join(A, B, "ID", "ID", "name", "name", tok,
                                   0.8, salt_target=4).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = set_sim_join_oracle(A, B, "ID", "ID", "name", "name", tok,
                              fu.OVERLAP_COEFFICIENT, 0.8)
    assert got == exp


def test_salted_edit_distance(tiny_salt):
    A, _ = make_tables(seed=83, n_a=60)
    A["name"] = A["name"].map(lambda s: s[:10] if isinstance(s, str) else s)
    tok = QgramTokenizer(2)
    out = edit_distance_join(A, None, "ID", "ID", "name", "name", tok, 3,
                             self_join=True, salt_target=2).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = edit_distance_join_oracle(A, None, "ID", "ID", "name", "name", tok, 3,
                                    self_join=True)
    assert got == exp


def test_salt_cells_cover_each_pair_once():
    """Unit property: for any (salt_l, salt_r) the pair meets in exactly one
    cell across the two rows' emitted cell lists."""
    rng = np.random.default_rng(5)
    counts = np.array([100], dtype=np.int64)  # one token, df 100 → salted
    for trial in range(50):
        J_SALT = 4
        import rayssj.joins as JJ

        old = JJ.SALT_TARGET
        JJ.SALT_TARGET = 16  # df 100 → s = ceil(100/16) = 7
        try:
            ptok = np.array([0, 0], dtype=np.int64)
            row_ids = np.array([0, 1], dtype=np.int64)
            keyhash = rng.integers(0, 2**40, size=2).astype(np.int64)
            # _salt_cells now takes the PRE-GATHERED per-row df (works for
            # both TokenOrder and HashedTokenOrder)
            rep, grp, out_side = JJ._salt_cells(ptok, row_ids, keyhash,
                                                counts[ptok],
                                                side=0, self_mode=True)
            cells_a = [(g, s) for g, s, r in zip(grp, out_side, rep) if r == 0]
            cells_b = [(g, s) for g, s, r in zip(grp, out_side, rep) if r == 1]
            # pairable cells: same grp, opposite roles (or both side 0 in the
            # diagonal cell)
            meet = 0
            for ga, sa in cells_a:
                for gb, sb in cells_b:
                    if ga != gb:
                        continue
                    diag = (ga % (JJ.SALT_MAX * JJ.SALT_MAX)) // JJ.SALT_MAX == \
                           (ga % (JJ.SALT_MAX * JJ.SALT_MAX)) % JJ.SALT_MAX
                    if diag and sa == 0 and sb == 0:
                        meet += 1
                    elif not diag and sa != sb:
                        meet += 1
            assert meet == 1, (cells_a, cells_b)
        finally:
            JJ.SALT_TARGET = old
