"""Nested-loop oracles for join/filter equivalence tests (SURVEY.md §5)."""

from __future__ import annotations

import math

from rayssj.filter_utils import SIM_FUNCTIONS, COMP_OP_MAP, levenshtein


def _is_missing(v):
    return v is None or (isinstance(v, float) and math.isnan(v))


def set_sim_join_oracle(A, B, key_a, key_b, attr_a, attr_b, tokenizer, measure,
                        threshold, comp_op=">=", allow_empty=True,
                        allow_missing=False, self_join=False):
    """Set of (l_key, r_key, score-or-None). None score = missing pair."""
    sim = SIM_FUNCTIONS[measure]
    comp = COMP_OP_MAP[comp_op]
    out = set()
    rows_a = list(A[[key_a, attr_a]].itertuples(index=False))
    rows_b = rows_a if self_join else list(B[[key_b, attr_b]].itertuples(index=False))
    for ka, sa in rows_a:
        for kb, sb in rows_b:
            if self_join and not (ka < kb):
                continue
            ma, mb = _is_missing(sa), _is_missing(sb)
            if ma or mb:
                if allow_missing:
                    out.add((ka, kb, None))
                continue
            ta = set(tokenizer.tokenize(sa))
            tb = set(tokenizer.tokenize(sb))
            if len(ta) == 0 and len(tb) == 0:
                if allow_empty and measure != "OVERLAP" and comp(1.0, threshold):
                    out.add((ka, kb, 1.0))
                continue
            if len(ta) == 0 or len(tb) == 0:
                continue
            s = sim(ta, tb)
            if comp(s, threshold):
                out.add((ka, kb, round(s, 6)))
    return out


def edit_distance_join_oracle(A, B, key_a, key_b, attr_a, attr_b, tokenizer,
                              threshold, comp_op="<=", allow_missing=False,
                              self_join=False):
    comp = COMP_OP_MAP[comp_op]
    out = set()
    rows_a = list(A[[key_a, attr_a]].itertuples(index=False))
    rows_b = rows_a if self_join else list(B[[key_b, attr_b]].itertuples(index=False))
    for ka, sa in rows_a:
        for kb, sb in rows_b:
            if self_join and not (ka < kb):
                continue
            ma, mb = _is_missing(sa), _is_missing(sb)
            if ma or mb:
                if allow_missing:
                    out.add((ka, kb, None))
                continue
            # blocking domain: pairs sharing ZERO q-grams are invisible to
            # q-gram prefix blocking — the reference's index probe misses them
            # identically (known upstream incompleteness for very short
            # strings; mitigated by padding)
            ta, tb = set(tokenizer.tokenize(sa)), set(tokenizer.tokenize(sb))
            if not (ta & tb):
                continue
            d = levenshtein(sa, sb)
            if comp(d, threshold):
                out.add((ka, kb, float(d)))
    return out


def result_pair_set(df, l_col, r_col, score_col="_sim_score"):
    out = set()
    scores = df[score_col] if score_col in df.columns else [None] * len(df)
    for lk, rk, s in zip(df[l_col], df[r_col], scores):
        if s is not None and isinstance(s, float) and math.isnan(s):
            s = None
        out.add((lk, rk, None if s is None else round(float(s), 6)))
    return out
