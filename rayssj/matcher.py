"""apply_matcher — score an arbitrary candidate set with a user sim function.

Reference: [ref: py_stringsimjoin/matcher/apply_matcher.py:~30 †U] (SURVEY.md
§2 #14). Ray design: the candset Dataset is hash-joined to both input tables on
their keys to fetch the match attrs (the reference builds driver-side
key→row dicts; at scale that is the broadcast-vs-shuffle choice — we shuffle),
then a ``map_batches`` stage applies the (arbitrary Python) tokenizer + sim
function per pair and filters on ``comp_op threshold``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from rayssj.filter_utils import COMP_OP_MAP
from rayssj.joins import DEFAULT_NUM_BUCKETS, _as_dataset, _drop_if_present, _rename_ds, hash_join, join_num_partitions
from rayssj.validation import validate_attr, validate_comp_op, _schema_of

_L_STR = "__l_match_str"
_R_STR = "__r_match_str"


def _fast_scorer(tokenizer, sim_function, threshold, comp_op, allow_missing):
    """Vectorized scorer when ``sim_function`` is one of the built-in measures
    (VERDICT r02 task 5): batch tokenization + one overlap lexsort replace the
    per-pair Python calls; arbitrary UDFs keep the scalar fallback. Returns a
    pyarrow map_batches callable, or None when no fast path applies."""
    from rayssj import filter_utils as fu
    from rayssj.filter_utils import compute_sim

    comp_fn = COMP_OP_MAP[comp_op]
    measure = {fu.jaccard: fu.JACCARD, fu.cosine: fu.COSINE, fu.dice: fu.DICE,
               fu.overlap: fu.OVERLAP,
               fu.overlap_coefficient: fu.OVERLAP_COEFFICIENT}.get(sim_function)

    def _cols(t: pa.Table):
        l = t[_L_STR].combine_chunks() if isinstance(t[_L_STR], pa.ChunkedArray) else t[_L_STR]
        r = t[_R_STR].combine_chunks() if isinstance(t[_R_STR], pa.ChunkedArray) else t[_R_STR]
        import pyarrow.compute as pc

        miss = (pc.is_null(l).to_numpy(zero_copy_only=False)
                | pc.is_null(r).to_numpy(zero_copy_only=False)).astype(bool)
        return l, r, miss

    def _emit(t: pa.Table, keep, scores):
        keep = np.asarray(keep, dtype=bool)
        out = t.filter(pa.array(keep))
        return out.append_column("_sim_score", pa.array(scores[keep]))

    if measure is not None and tokenizer is not None:
        from rayssj.joins import _clone_tokenizer
        from rayssj.tokenizers import batch_overlap_counts

        def score_set(t: pa.Table) -> pa.Table:
            l, r, miss = _cols(t)
            tk = _clone_tokenizer(tokenizer, return_set=True)
            o, nl, nr = batch_overlap_counts(tk.tokenize_batch(l.fill_null("")),
                                             tk.tokenize_batch(r.fill_null("")))
            sim = np.asarray(compute_sim(measure, o, nl, nr), dtype=np.float64)
            if measure != fu.OVERLAP:  # scalar measures: both-empty -> 1.0
                sim[(nl == 0) & (nr == 0)] = 1.0
            keep = comp_fn(sim, threshold)
            sim[miss] = np.nan
            keep = np.where(miss, allow_missing, keep)
            return _emit(t, keep, sim)

        return score_set

    if (sim_function is fu.levenshtein and tokenizer is None
            and comp_op in ("<=", "<")):
        from rayssj.levenshtein import levenshtein_pairs_capped

        cap = int(math.ceil(threshold))

        def score_lev(t: pa.Table) -> pa.Table:
            l, r, miss = _cols(t)
            dist = levenshtein_pairs_capped(
                l.fill_null("").to_pylist(), r.fill_null("").to_pylist(), cap
            ).astype(np.float64)
            keep = comp_fn(dist, threshold)
            dist[miss] = np.nan
            keep = np.where(miss, allow_missing, keep)
            return _emit(t, keep, dist)

        return score_lev

    return None


def fetch_pair_strings(candset, candset_l_key_attr, candset_r_key_attr,
                       ltable, rtable, l_key_attr, r_key_attr,
                       l_fetch_attr, r_fetch_attr,
                       l_col=_L_STR, r_col=_R_STR,
                       num_partitions=DEFAULT_NUM_BUCKETS,
                       l_extra=None, r_extra=None,
                       l_extra_prefix="l_", r_extra_prefix="r_"):
    """Join candset (l_key, r_key) to both tables to attach one attr per side
    (plus optional prefixed extra out-attrs). Keeps all candset columns."""
    cand = _as_dataset(candset)
    l_ds = _as_dataset(ltable)
    r_ds = _as_dataset(rtable)

    def attach(cand, src, key_attr, fetch_attr, out_col, cand_key, extra, extra_prefix):
        cols = [key_attr, fetch_attr] + [a for a in (extra or []) if a != fetch_attr]
        side = src.select_columns(list(dict.fromkeys(cols)))
        renames = {key_attr: "__jk", fetch_attr: out_col}
        for a in (extra or []):
            if a != fetch_attr:
                renames[a] = extra_prefix + a
        side = _rename_ds(side, renames)
        out = hash_join(cand, side, on=(cand_key,), right_on=("__jk",))
        return _drop_if_present(out, ["__jk"])

    cand = attach(cand, l_ds, l_key_attr, l_fetch_attr, l_col,
                  candset_l_key_attr, l_extra, l_extra_prefix)
    cand = attach(cand, r_ds, r_key_attr, r_fetch_attr, r_col,
                  candset_r_key_attr, r_extra, r_extra_prefix)
    return cand


def apply_matcher(candset, candset_l_key_attr, candset_r_key_attr,
                  ltable, rtable, l_key_attr, r_key_attr,
                  l_match_attr, r_match_attr, tokenizer, sim_function,
                  threshold, comp_op=">=", allow_missing=False,
                  l_out_attrs=None, r_out_attrs=None,
                  l_out_prefix="l_", r_out_prefix="r_",
                  out_sim_score=True, n_jobs=1, show_progress=False,
                  num_partitions=DEFAULT_NUM_BUCKETS):
    """Score each candset pair with ``sim_function`` (over tokenized strings if
    ``tokenizer`` is given, else raw strings); keep pairs passing
    ``comp_op threshold``. Missing match attrs: dropped, or kept with NaN score
    when ``allow_missing`` [ref: matcher/apply_matcher.py:~60-200 †U]."""
    validate_comp_op(comp_op)
    cand = _as_dataset(candset)
    cand_schema = _schema_of(cand)
    validate_attr(candset_l_key_attr, cand_schema.names, "key", "candset")
    validate_attr(candset_r_key_attr, cand_schema.names, "key", "candset")
    orig_cols = [c for c in cand_schema.names]
    out_cols = list(orig_cols)
    out_cols += [l_out_prefix + a for a in (l_out_attrs or [])]
    out_cols += [r_out_prefix + a for a in (r_out_attrs or [])]
    if out_sim_score:
        out_cols.append("_sim_score")

    from rayssj.joins import _probe_empty

    if _probe_empty(cand):
        import ray.data as rd

        l_schema = _schema_of(_as_dataset(ltable))
        r_schema = _schema_of(_as_dataset(rtable))
        fields = [pa.field(c, cand_schema.field(c).type) for c in orig_cols]
        fields += [pa.field(l_out_prefix + a, l_schema.field(a).type)
                   for a in (l_out_attrs or [])]
        fields += [pa.field(r_out_prefix + a, r_schema.field(a).type)
                   for a in (r_out_attrs or [])]
        if out_sim_score:
            fields.append(pa.field("_sim_score", pa.float64()))
        return rd.from_arrow(pa.schema(fields).empty_table())

    fetched = fetch_pair_strings(
        cand, candset_l_key_attr, candset_r_key_attr, ltable, rtable,
        l_key_attr, r_key_attr, l_match_attr, r_match_attr,
        num_partitions=num_partitions,
        l_extra=l_out_attrs, r_extra=r_out_attrs,
        l_extra_prefix=l_out_prefix, r_extra_prefix=r_out_prefix)

    comp_fn = COMP_OP_MAP[comp_op]

    fast = _fast_scorer(tokenizer, sim_function, threshold, comp_op,
                        allow_missing)
    if fast is not None:
        scored = fetched.map_batches(fast, batch_format="pyarrow",
                                     zero_copy_batch=True)
        return scored.select_columns(out_cols)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ls = batch[_L_STR]
        rs = batch[_R_STR]
        scores = np.full(len(batch), np.nan, dtype=np.float64)
        keep = np.zeros(len(batch), dtype=bool)
        for i, (a, b) in enumerate(zip(ls, rs)):
            a_missing = a is None or (isinstance(a, float) and math.isnan(a))
            b_missing = b is None or (isinstance(b, float) and math.isnan(b))
            if a_missing or b_missing:
                keep[i] = allow_missing
                continue
            if tokenizer is not None:
                a, b = tokenizer.tokenize(a), tokenizer.tokenize(b)
            s = float(sim_function(a, b))
            scores[i] = s
            keep[i] = bool(comp_fn(s, threshold))
        out = batch.loc[keep].copy()
        out["_sim_score"] = scores[keep]
        return out

    scored = fetched.map_batches(score, batch_format="pandas")
    return scored.select_columns(out_cols)
