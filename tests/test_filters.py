"""Per-filter suites (SURVEY.md §5): filter_pair truth tables + the
completeness property (filter_tables output ⊇ true join pairs), mirroring the
reference's tests/test_*_filter.py files."""

import pandas as pd
import pytest

from rayssj import (
    OverlapFilter,
    PositionFilter,
    PrefixFilter,
    SizeFilter,
    SuffixFilter,
    WhitespaceTokenizer,
    QgramTokenizer,
)
from rayssj import filter_utils as fu

from .oracle import result_pair_set, set_sim_join_oracle
from .test_joins import make_tables

TOK = WhitespaceTokenizer(return_set=True)


def test_overlap_filter_pair():
    f = OverlapFilter(TOK, overlap_size=2)
    assert not f.filter_pair("a b c", "b c d")   # overlap 2 → keep
    assert f.filter_pair("a b c", "c d e")       # overlap 1 → prune
    assert f.filter_pair(None, "x")              # missing → prune
    assert not OverlapFilter(TOK, 1, allow_missing=True).filter_pair(None, "x")
    with pytest.raises(AssertionError):
        OverlapFilter(TOK, overlap_size=0)


def test_size_filter_pair():
    f = SizeFilter(TOK, fu.JACCARD, 0.8)
    assert not f.filter_pair("a b c d e", "a b c d")   # 4 in [4,6]
    assert f.filter_pair("a b c d e", "a b")           # 2 < ceil(4)
    assert not SizeFilter(TOK, fu.JACCARD, 0.5).filter_pair("", "")  # allow_empty
    assert SizeFilter(TOK, fu.JACCARD, 0.5, allow_empty=False).filter_pair("", "")


def test_prefix_filter_pair():
    f = PrefixFilter(TOK, fu.JACCARD, 0.8)
    # identical strings always share prefix
    assert not f.filter_pair("a b c d e", "a b c d e")
    # disjoint token sets must prune
    assert f.filter_pair("a b c", "x y z")


def test_position_filter_pair():
    f = PositionFilter(TOK, fu.JACCARD, 0.8)
    assert not f.filter_pair("a b c d e", "a b c d e")
    assert f.filter_pair("a b c d e", "a x y z w")  # overlap 1 << needed


def test_suffix_filter_pair():
    f = SuffixFilter(TOK, fu.JACCARD, 0.8)
    assert not f.filter_pair("a b c d e", "a b c d e")
    assert f.filter_pair("a b c", "x y z")


@pytest.mark.parametrize("filter_cls", [PrefixFilter, PositionFilter, SuffixFilter])
@pytest.mark.parametrize("measure,t", [(fu.JACCARD, 0.6), (fu.COSINE, 0.7)])
def test_filter_pair_completeness(filter_cls, measure, t):
    """A filter must NEVER prune a pair whose true similarity passes t."""
    A, B = make_tables(seed=17)
    f = filter_cls(TOK, measure, t)
    sim = fu.SIM_FUNCTIONS[measure]
    for sa in A["name"].dropna():
        for sb in B["name"].dropna():
            ta, tb = set(TOK.tokenize(sa)), set(TOK.tokenize(sb))
            if not ta or not tb:
                continue
            if sim(ta, tb) >= t:
                assert not f.filter_pair(sa, sb), (sa, sb)


def test_overlap_filter_tables_equivalence():
    A, B = make_tables(seed=23)
    f = OverlapFilter(TOK, overlap_size=2)
    out = f.filter_tables(A, B, "ID", "ID", "name", "name").to_pandas()
    got = set(zip(out["l_ID"], out["r_ID"]))
    exp = {(a, b, s)[0:2] for (a, b, s) in set_sim_join_oracle(
        A, B, "ID", "ID", "name", "name", TOK, fu.OVERLAP, 2,
        allow_empty=False)}
    assert got == exp


@pytest.mark.parametrize("filter_cls", [PrefixFilter, PositionFilter, SizeFilter])
def test_filter_tables_superset_of_join(filter_cls):
    """Blocking completeness: candset ⊇ true jaccard matches at the same t."""
    A, B = make_tables(seed=29)
    t = 0.6
    f = filter_cls(TOK, fu.JACCARD, t)
    out = f.filter_tables(A, B, "ID", "ID", "name", "name").to_pandas()
    cand = set(zip(out["l_ID"], out["r_ID"]))
    true = {(a, b) for (a, b, s) in set_sim_join_oracle(
        A, B, "ID", "ID", "name", "name", TOK, fu.JACCARD, t,
        allow_empty=False)}
    assert true <= cand, sorted(true - cand)[:5]


def test_filter_candset_refinement():
    A, B = make_tables(seed=31)
    f1 = OverlapFilter(TOK, overlap_size=1)
    cand = f1.filter_tables(A, B, "ID", "ID", "name", "name")
    f2 = OverlapFilter(TOK, overlap_size=3)
    refined = f2.filter_candset(cand, "l_ID", "r_ID", A, B, "ID", "ID",
                                "name", "name").to_pandas()
    got = set(zip(refined["l_ID"], refined["r_ID"]))
    exp = {(a, b) for (a, b, s) in set_sim_join_oracle(
        A, B, "ID", "ID", "name", "name", TOK, fu.OVERLAP, 3,
        allow_empty=False)}
    assert got == exp


def test_suffix_filter_tables_no_false_negatives():
    A, B = make_tables(seed=37, n_a=20, n_b=20)
    t = 0.6
    f = SuffixFilter(TOK, fu.JACCARD, t)
    out = f.filter_tables(A, B, "ID", "ID", "name", "name").to_pandas()
    cand = set(zip(out["l_ID"], out["r_ID"]))
    true = {(a, b) for (a, b, s) in set_sim_join_oracle(
        A, B, "ID", "ID", "name", "name", TOK, fu.JACCARD, t,
        allow_empty=False)}
    assert true <= cand


def _rand_strings(rng, n, vocab, max_words):
    out = []
    for _ in range(n):
        w = rng.integers(0, max_words + 1)
        out.append(" ".join(rng.choice(vocab, size=w)) if w else "")
    return out


@pytest.mark.parametrize("make_filter", [
    lambda tok: OverlapFilter(tok, overlap_size=2),
    lambda tok: OverlapFilter(tok, overlap_size=1, comp_op=">", allow_missing=True),
    lambda tok: SizeFilter(tok, fu.JACCARD, 0.6),
    lambda tok: SizeFilter(tok, fu.COSINE, 0.7, allow_empty=False),
    lambda tok: PrefixFilter(tok, fu.JACCARD, 0.5),
    lambda tok: PrefixFilter(tok, fu.DICE, 0.7, allow_missing=True),
    lambda tok: PositionFilter(tok, fu.JACCARD, 0.5),
    lambda tok: PositionFilter(tok, fu.OVERLAP_COEFFICIENT, 0.8),
    lambda tok: PositionFilter(tok, fu.COSINE, 0.6, allow_empty=False),
])
def test_keep_batch_matches_filter_pair(make_filter):
    """The vectorized _keep_batch must produce the exact complement of the
    scalar filter_pair over adversarial pairs (empties, dups, missing)."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(7)
    vocab = np.array(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "zz q"])
    n = 300
    ls = _rand_strings(rng, n, vocab, 8)
    rs = _rand_strings(rng, n, vocab, 8)
    ls[5] = None
    rs[11] = None
    ls[12] = rs[12] = ""
    ls[13] = rs[13]  # identical
    for tok in (WhitespaceTokenizer(), QgramTokenizer(qval=2, return_set=True)):
        f = make_filter(tok)
        scalar = np.array([not f.filter_pair(a, b) for a, b in zip(ls, rs)])
        batch = f._keep_batch(pa.array(ls, type=pa.string()),
                              pa.array(rs, type=pa.string()))
        bad = np.nonzero(scalar != np.asarray(batch))[0]
        assert len(bad) == 0, (type(f).__name__, bad[:5],
                               [(ls[i], rs[i]) for i in bad[:3]])


def test_null_heavy_tiny_tables_end_to_end():
    """All-null 1-row repartition slices infer Arrow type ``null`` for the
    string attr, and map_groups' empty sort partitions emit ZERO-COLUMN blocks
    that poison downstream pyarrow joins ('No match for FieldRef') — both
    crashed here before the as_string_array / hash_join scrub fixes."""
    from rayssj import jaccard_join

    A = pd.DataFrame({"ID": [f"a{i}" for i in range(8)],
                      "name": [None, "x y z", None, "x y", None, None, "q r", None]})
    B = pd.DataFrame({"ID": [f"b{i}" for i in range(8)],
                      "name": [None] * 7 + ["x y z"]})
    f = SuffixFilter(TOK, fu.JACCARD, 0.5)
    sf = f.filter_tables(A, B, "ID", "ID", "name", "name").to_pandas()
    assert set(zip(sf["l_ID"], sf["r_ID"])) == {("a1", "b7"), ("a3", "b7")}
    out = jaccard_join(A, B, "ID", "ID", "name", "name", TOK, 0.5,
                       l_out_attrs=["name"], r_out_attrs=["name"]).to_pandas()
    assert set(zip(out["l_ID"], out["r_ID"])) == {("a1", "b7"), ("a3", "b7")}
    assert set(out.columns) == {"l_ID", "r_ID", "l_name", "r_name", "_sim_score"}


def test_filter_tables_allow_missing_streamed():
    """allow_missing filter_tables: missing-side pairs arrive via the
    streamed cross-product datasets (no driver-side all-keys collect)."""
    A = pd.DataFrame({"ID": ["a1", "a2", "a3"],
                      "name": ["x y z", None, "p q"]})
    B = pd.DataFrame({"ID": ["b1", "b2"],
                      "name": ["x y z", None]})
    f = OverlapFilter(TOK, 1, allow_missing=True)
    out = f.filter_tables(A, B, "ID", "ID", "name", "name").to_pandas()
    got = set(zip(out["l_ID"], out["r_ID"]))
    # a2 (missing) x all B; all nonmissing A x b2 (missing); plus real overlap
    assert {("a2", "b1"), ("a2", "b2"), ("a1", "b2"), ("a3", "b2"),
            ("a1", "b1")} == got
