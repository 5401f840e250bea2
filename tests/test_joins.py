"""Join-output equivalence vs nested-loop oracle (SURVEY.md §5 plan #3),
mirroring the reference test matrix [ref: py_stringsimjoin/tests/test_join.py †U]."""

import math
import random

import numpy as np
import pandas as pd
import pytest

from rayssj import (
    QgramTokenizer,
    WhitespaceTokenizer,
    cosine_join,
    dice_join,
    edit_distance_join,
    jaccard_join,
    overlap_coefficient_join,
    overlap_join,
)
from rayssj import filter_utils as fu

from .oracle import (
    edit_distance_join_oracle,
    result_pair_set,
    set_sim_join_oracle,
)

JOINS = {
    fu.JACCARD: jaccard_join,
    fu.COSINE: cosine_join,
    fu.DICE: dice_join,
    fu.OVERLAP_COEFFICIENT: overlap_coefficient_join,
    fu.OVERLAP: overlap_join,
}

WORDS = ["data", "base", "system", "query", "join", "filter", "index", "merge",
         "scan", "sort", "hash", "tree", "node", "graph", "table", "row"]


def make_tables(seed=11, n_a=45, n_b=40, with_edge_cases=True):
    rng = random.Random(seed)

    def txt():
        return " ".join(rng.choices(WORDS, k=rng.randint(1, 9)))

    A = pd.DataFrame({"ID": [f"a{i}" for i in range(n_a)],
                      "name": [txt() for _ in range(n_a)]})
    B = pd.DataFrame({"ID": [f"b{i}" for i in range(n_b)],
                      "name": [txt() for _ in range(n_b)]})
    if with_edge_cases:
        A.loc[0, "name"] = ""          # empty token set
        A.loc[1, "name"] = None        # missing
        A.loc[2, "name"] = "zz"        # len < q
        B.loc[0, "name"] = ""
        B.loc[1, "name"] = None
        B.loc[2, "name"] = A.loc[3, "name"]  # exact dup across tables
    return A, B


@pytest.mark.parametrize("measure", list(JOINS))
@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_set_sim_joins_whitespace(measure, threshold):
    A, B = make_tables()
    tok = WhitespaceTokenizer(return_set=True)
    t = 3 if measure == fu.OVERLAP else threshold
    out = JOINS[measure](A, B, "ID", "ID", "name", "name", tok, t).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = set_sim_join_oracle(A, B, "ID", "ID", "name", "name", tok, measure, t,
                              allow_empty=(measure != fu.OVERLAP))
    assert got == exp


@pytest.mark.parametrize("measure", [fu.JACCARD, fu.COSINE])
@pytest.mark.parametrize("q", [2, 3])
def test_set_sim_joins_qgram(measure, q):
    A, B = make_tables(seed=5)
    tok = QgramTokenizer(q, return_set=True)
    out = JOINS[measure](A, B, "ID", "ID", "name", "name", tok, 0.6).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = set_sim_join_oracle(A, B, "ID", "ID", "name", "name", tok, measure, 0.6)
    assert got == exp


@pytest.mark.parametrize("comp_op", [">=", ">"])
def test_comp_op_variants(comp_op):
    A, B = make_tables(seed=9)
    tok = WhitespaceTokenizer()
    out = jaccard_join(A, B, "ID", "ID", "name", "name", tok, 0.5,
                       comp_op=comp_op).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = set_sim_join_oracle(A, B, "ID", "ID", "name", "name", tok,
                              fu.JACCARD, 0.5, comp_op=comp_op)
    assert got == exp


def test_allow_empty_false():
    A, B = make_tables()
    tok = WhitespaceTokenizer()
    out = jaccard_join(A, B, "ID", "ID", "name", "name", tok, 0.5,
                       allow_empty=False).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = set_sim_join_oracle(A, B, "ID", "ID", "name", "name", tok,
                              fu.JACCARD, 0.5, allow_empty=False)
    assert got == exp


def test_allow_missing_true():
    A, B = make_tables()
    tok = WhitespaceTokenizer()
    out = jaccard_join(A, B, "ID", "ID", "name", "name", tok, 0.5,
                       allow_missing=True).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = set_sim_join_oracle(A, B, "ID", "ID", "name", "name", tok,
                              fu.JACCARD, 0.5, allow_missing=True)
    assert got == exp


def test_self_join_mode():
    A, _ = make_tables(seed=21, n_a=60)
    tok = WhitespaceTokenizer()
    out = jaccard_join(A, None, "ID", "ID", "name", "name", tok, 0.6,
                       self_join=True).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = set_sim_join_oracle(A, None, "ID", "ID", "name", "name", tok,
                              fu.JACCARD, 0.6, self_join=True)
    assert got == exp


def test_output_attrs_and_prefixes():
    A, B = make_tables()
    A["extra"] = ["x" + str(i) for i in range(len(A))]
    B["extra"] = ["y" + str(i) for i in range(len(B))]
    tok = WhitespaceTokenizer()
    out = jaccard_join(A, B, "ID", "ID", "name", "name", tok, 0.5,
                       l_out_attrs=["extra"], r_out_attrs=["extra", "name"],
                       l_out_prefix="L.", r_out_prefix="R.").to_pandas()
    assert list(out.columns) == ["L.ID", "R.ID", "L.extra", "R.extra", "R.name",
                                 "_sim_score"]
    amap = dict(zip(A["ID"], A["extra"]))
    for lid, lex in zip(out["L.ID"], out["L.extra"]):
        assert lex == amap[lid]


def test_out_sim_score_false():
    A, B = make_tables()
    tok = WhitespaceTokenizer()
    out = jaccard_join(A, B, "ID", "ID", "name", "name", tok, 0.5,
                       out_sim_score=False).to_pandas()
    assert "_sim_score" not in out.columns


@pytest.mark.parametrize("q,t", [(2, 2), (3, 3)])
def test_edit_distance_join(q, t):
    A, B = make_tables(seed=31)
    # shorter strings so distances are within reach
    A["name"] = A["name"].map(lambda s: s[:12] if isinstance(s, str) else s)
    B["name"] = B["name"].map(lambda s: s[:12] if isinstance(s, str) else s)
    tok = QgramTokenizer(q)
    out = edit_distance_join(A, B, "ID", "ID", "name", "name", tok, t).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = edit_distance_join_oracle(A, B, "ID", "ID", "name", "name", tok, t)
    assert got == exp


def test_edit_distance_self_join():
    A, _ = make_tables(seed=33, n_a=50)
    A["name"] = A["name"].map(lambda s: s[:10] if isinstance(s, str) else s)
    tok = QgramTokenizer(2)
    out = edit_distance_join(A, None, "ID", "ID", "name", "name", tok, 3,
                             self_join=True).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    exp = edit_distance_join_oracle(A, None, "ID", "ID", "name", "name", tok, 3,
                                    self_join=True)
    assert got == exp


def test_validation_errors():
    A, B = make_tables()
    tok = WhitespaceTokenizer()
    with pytest.raises(AssertionError):
        jaccard_join(A, B, "nope", "ID", "name", "name", tok, 0.5)
    with pytest.raises(AssertionError):
        jaccard_join(A, B, "ID", "ID", "name", "name", tok, 1.5)
    with pytest.raises(AssertionError):
        jaccard_join(A, B, "ID", "ID", "name", "name", tok, 0.5, comp_op="<=")
    with pytest.raises(AssertionError):
        jaccard_join(A, B, "ID", "ID", "name", "name", "notatok", 0.5)
    with pytest.raises(AssertionError):
        edit_distance_join(A, B, "ID", "ID", "name", "name",
                           WhitespaceTokenizer(), 2)
    num = A.copy()
    num["num"] = 1
    with pytest.raises(AssertionError):
        jaccard_join(num, B, "ID", "ID", "num", "name", tok, 0.5)


def test_out_id_dense():
    """out_id=True prepends a dense 0..n-1 _id column (reference-shaped)."""
    A, B = make_tables(with_edge_cases=False)
    out = jaccard_join(A, B, "ID", "ID", "name", "name",
                       WhitespaceTokenizer(), 0.3, out_id=True).to_pandas()
    assert list(out.columns)[0] == "_id"
    assert sorted(out["_id"]) == list(range(len(out)))
    base = jaccard_join(A, B, "ID", "ID", "name", "name",
                        WhitespaceTokenizer(), 0.3).to_pandas()
    assert len(base) == len(out) > 0


def test_broadcast_vs_heavy_rank_modes_identical(monkeypatch):
    """The broadcast-ranks kernel path (rank arrays via ray.put lookup) must
    emit exactly the heavy-row shuffle path's pairs — two-table AND self-join,
    including null/empty-string edge rows."""
    import rayssj.joins as J

    A, B = make_tables()
    tok = WhitespaceTokenizer()

    def run(cap):
        monkeypatch.setattr(J, "_BCAST_RANKS_MAX_BYTES", cap)
        two = jaccard_join(A, B, "ID", "ID", "name", "name", tok, 0.3).to_pandas()
        slf = cosine_join(A, None, "ID", "ID", "name", "name", tok, 0.5,
                          self_join=True).to_pandas()
        return (result_pair_set(two, "l_ID", "r_ID"),
                result_pair_set(slf, "l_ID", "r_ID"))

    bc_two, bc_slf = run(1 << 30)
    hv_two, hv_slf = run(0)
    assert bc_two == hv_two and len(bc_two) > 0
    assert bc_slf == hv_slf and len(bc_slf) > 0


def test_ed_broadcast_vs_heavy_modes_identical(monkeypatch):
    """Edit-distance broadcast mode (grams+strings via ray.put lookup) must
    match the per-row payload path exactly."""
    import rayssj.joins as J

    A, B = make_tables()
    tok = QgramTokenizer(2)

    def run(cap):
        monkeypatch.setattr(J, "_BCAST_RANKS_MAX_BYTES", cap)
        two = edit_distance_join(A, B, "ID", "ID", "name", "name", tok, 3).to_pandas()
        slf = edit_distance_join(A, None, "ID", "ID", "name", "name", tok, 2,
                                 self_join=True).to_pandas()
        return (result_pair_set(two, "l_ID", "r_ID"),
                result_pair_set(slf, "l_ID", "r_ID"))

    bc_two, bc_slf = run(1 << 30)
    hv_two, hv_slf = run(0)
    assert bc_two == hv_two and len(bc_two) > 0
    assert bc_slf == hv_slf


def test_broadcast_assembly_runs_off_driver(monkeypatch):
    """The broadcast rank/gram tables must be assembled in a Ray WORKER task,
    never on the driver (VERDICT r03 next #8: driver RSS stays flat at the
    256 MiB cap). Poisoning the driver-module assembly fns proves the build
    executes in worker processes (which import rayssj.joins unpatched); the
    returned refs must still resolve to well-formed lookup tables."""
    import ray
    import ray.data as rd

    import rayssj.joins as J
    from rayssj.ordering import build_token_order

    def boom(*a, **k):
        raise AssertionError("broadcast assembly ran on the driver")

    monkeypatch.setattr(J, "_ranks_side_from_tables", boom)
    monkeypatch.setattr(J, "_ed_side_from_tables", boom)

    A, _ = make_tables(with_edge_cases=False)
    ds = rd.from_pandas(A)
    tok = WhitespaceTokenizer()
    clean = J._drop_missing(
        J._tokenize_stage(ds, "ID", "name", tok, keep_string=True))
    order = build_token_order(clean)
    order_ref = ray.put(order)

    ref = J._build_ranks_broadcast(clean, None, order_ref, True, np.int32)
    tbl = ray.get(ref)
    h = tbl["s0"]["h"]
    assert len(h) == len(A) and (np.diff(h) > 0).all()
    assert tbl["s1"] is None and len(tbl["rv"]) == int(tbl["s0"]["ln"].sum())

    ed_ref = J._build_ed_broadcast(clean, None, order_ref, True)
    ed = ray.get(ed_ref)
    assert len(ed["s0"]["h"]) == len(A) and len(ed["strs"]) == len(A)
