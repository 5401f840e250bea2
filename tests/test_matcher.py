"""apply_matcher equivalence vs direct computation (SURVEY.md §5 /
reference tests/test_matcher.py)."""

import math

import pandas as pd
import pytest

from rayssj import OverlapFilter, WhitespaceTokenizer, apply_matcher
from rayssj.filter_utils import jaccard, overlap

from .oracle import result_pair_set
from .test_joins import make_tables

TOK = WhitespaceTokenizer(return_set=True)


def _candset(A, B):
    return OverlapFilter(TOK, overlap_size=1).filter_tables(
        A, B, "ID", "ID", "name", "name")


def test_apply_matcher_jaccard():
    A, B = make_tables(seed=41)
    cand = _candset(A, B).to_pandas()
    out = apply_matcher(cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
                        WhitespaceTokenizer(), jaccard, 0.5).to_pandas()
    got = result_pair_set(out, "l_ID", "r_ID")
    amap = dict(zip(A["ID"], A["name"]))
    bmap = dict(zip(B["ID"], B["name"]))
    exp = set()
    for la, rb in zip(cand["l_ID"], cand["r_ID"]):
        sa, sb = amap[la], bmap[rb]
        if sa is None or sb is None:
            continue
        s = jaccard(TOK.tokenize(sa), TOK.tokenize(sb))
        if s >= 0.5:
            exp.add((la, rb, round(s, 6)))
    assert got == exp


def test_apply_matcher_custom_udf_no_tokenizer():
    A, B = make_tables(seed=43)
    cand = _candset(A, B)

    def first_char_match(sa, sb) -> float:  # raw strings (tokenizer=None)
        return 1.0 if (sa and sb and sa[0] == sb[0]) else 0.0

    out = apply_matcher(cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
                        None, first_char_match, 1.0, comp_op="=").to_pandas()
    amap = dict(zip(A["ID"], A["name"]))
    bmap = dict(zip(B["ID"], B["name"]))
    for la, rb in zip(out["l_ID"], out["r_ID"]):
        assert amap[la][0] == bmap[rb][0]


def test_apply_matcher_allow_missing():
    A, B = make_tables(seed=47)
    cand = pd.DataFrame({"l_ID": ["a1", "a3"], "r_ID": ["b3", "b4"]})
    # a1 has null name
    out = apply_matcher(cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
                        WhitespaceTokenizer(), jaccard, 0.0,
                        allow_missing=True).to_pandas()
    rows = {(l, r) for l, r in zip(out["l_ID"], out["r_ID"])}
    assert ("a1", "b3") in rows  # kept with NaN score
    nan_rows = out[out["l_ID"] == "a1"]
    assert nan_rows["_sim_score"].isna().all()

    out2 = apply_matcher(cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
                         WhitespaceTokenizer(), jaccard, 0.0,
                         allow_missing=False).to_pandas()
    assert ("a1", "b3") not in set(zip(out2["l_ID"], out2["r_ID"]))


def test_apply_matcher_out_attrs():
    A, B = make_tables(seed=53)
    A["zip"] = [str(10000 + i) for i in range(len(A))]
    B["zip"] = [str(20000 + i) for i in range(len(B))]
    cand = _candset(A, B)
    out = apply_matcher(cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
                        WhitespaceTokenizer(), overlap, 1.0,
                        l_out_attrs=["zip"], r_out_attrs=["zip"]).to_pandas()
    assert "l_zip" in out.columns and "r_zip" in out.columns
    amap = dict(zip(A["ID"], A["zip"]))
    for la, z in zip(out["l_ID"], out["l_zip"]):
        assert z == amap[la]


def test_apply_matcher_fast_path_matches_udf():
    """Built-in measures dispatch to the vectorized scorer; a lambda wrapper
    of the same function forces the scalar UDF path — outputs must match."""
    import numpy as np

    from rayssj import filter_utils as fu
    from rayssj.matcher import _fast_scorer

    assert _fast_scorer(WhitespaceTokenizer(), fu.jaccard, 0.3, ">=", False) is not None
    assert _fast_scorer(WhitespaceTokenizer(), lambda a, b: 1.0, 0.3, ">=", False) is None

    A, B = make_tables(seed=61)
    cand = _candset(A, B).to_pandas()
    for fn, wrapped in ((jaccard, lambda a, b: jaccard(a, b)),
                        (overlap, lambda a, b: overlap(a, b))):
        fast = apply_matcher(cand, "l_ID", "r_ID", A, B, "ID", "ID",
                             "name", "name", WhitespaceTokenizer(), fn, 0.3,
                             allow_missing=True).to_pandas()
        slow = apply_matcher(cand, "l_ID", "r_ID", A, B, "ID", "ID",
                             "name", "name", WhitespaceTokenizer(), wrapped,
                             0.3, allow_missing=True).to_pandas()
        key = ["l_ID", "r_ID"]
        fast = fast.sort_values(key, ignore_index=True)
        slow = slow.sort_values(key, ignore_index=True)
        assert fast[key].equals(slow[key]) and len(fast) > 0
        assert np.allclose(fast["_sim_score"], slow["_sim_score"],
                           equal_nan=True)


def test_apply_matcher_fast_levenshtein():
    import numpy as np

    from rayssj import filter_utils as fu
    from rayssj.matcher import _fast_scorer

    assert _fast_scorer(None, fu.levenshtein, 2, "<=", False) is not None
    assert _fast_scorer(None, fu.levenshtein, 2, ">=", False) is None

    A, B = make_tables(seed=67)
    cand = _candset(A, B).to_pandas()
    fast = apply_matcher(cand, "l_ID", "r_ID", A, B, "ID", "ID", "name",
                         "name", None, fu.levenshtein, 6, comp_op="<=").to_pandas()
    slow = apply_matcher(cand, "l_ID", "r_ID", A, B, "ID", "ID", "name",
                         "name", None, lambda a, b: fu.levenshtein(a, b), 6,
                         comp_op="<=").to_pandas()
    key = ["l_ID", "r_ID"]
    fast = fast.sort_values(key, ignore_index=True)
    slow = slow.sort_values(key, ignore_index=True)
    assert fast[key].equals(slow[key]) and len(fast) > 0
    assert (fast["_sim_score"].to_numpy() == slow["_sim_score"].to_numpy()).all()
