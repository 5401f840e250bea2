"""Blocking / pair filters (SURVEY.md §2 #8-#12).

Reference tri-modal API [ref: py_stringsimjoin/filter/filter.py:~15 †U]:
``filter_pair(l_str, r_str) -> bool`` (True = PRUNE),
``filter_tables(...) -> candset Dataset``, ``filter_candset(...) -> Dataset``.

Ray design: ``filter_tables`` has NO driver-side index — each filter is a
blocking shuffle (token / prefix-token / size groupby) whose bucket kernels
apply the filter's bound; ``filter_candset`` is a key-join string fetch plus a
``map_batches`` predicate (SURVEY.md §2.4).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from rayssj import filter_utils as fu
from rayssj.filter_utils import COMP_OP_MAP
from rayssj.joins import (
    DEFAULT_NUM_BUCKETS,
    _bucket_groupby,
    _pool_size,
    _SetSimExploder,
    _as_dataset,
    _clone_tokenizer,
    _drop_missing,
    _missing_pair_datasets,
    _tokenize_stage,
)
from rayssj.kernels import make_filter_bucket_kernel, make_set_sim_bucket_kernel
from rayssj.ordering import TOKENS_COL, build_token_order
from rayssj.validation import validate_tokenizer, validate_threshold, validate_comp_op


def _pair_local_order(l_tokens, r_tokens):
    """Token ordering over just the two records (frequency asc, ties by token)
    — what the reference's filter_pair uses [ref: utils/token_ordering.py †U]."""
    freq: dict = {}
    for t in list(l_tokens) + list(r_tokens):
        freq[t] = freq.get(t, 0) + 1
    ordered = sorted(freq, key=lambda t: (freq[t], t))
    rank = {t: i for i, t in enumerate(ordered)}
    lo = sorted(set(l_tokens), key=lambda t: rank[t])
    ro = sorted(set(r_tokens), key=lambda t: rank[t])
    return lo, ro, rank


def _is_missing(v) -> bool:
    return v is None or (isinstance(v, float) and math.isnan(v))


def _null_mask(arr) -> np.ndarray:
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return pc.is_null(arr).to_numpy(zero_copy_only=False).astype(bool)


class _BaseFilter:
    """Shared candset-refinement path."""

    def filter_pair(self, lstring, rstring) -> bool:  # True = prune
        raise NotImplementedError

    # Batch refinement: subclasses with vectorizable bounds implement
    # ``_keep_batch(l_arr, r_arr) -> bool ndarray`` (True = KEEP, the
    # complement of filter_pair); filter_candset dispatches to it and
    # falls back to the scalar per-pair path otherwise (SuffixFilter).
    _keep_batch = None

    def _tok_sets_batch(self, l_arr, r_arr):
        """Deduped token lists + (overlap, sizes, missing masks) for a batch
        of string pairs — the vectorized counterpart of ``_tok_sets``."""
        from rayssj.joins import _clone_tokenizer
        from rayssj.tokenizers import as_string_array, batch_overlap_counts

        l_arr = as_string_array(l_arr)
        r_arr = as_string_array(r_arr)
        miss = _null_mask(l_arr) | _null_mask(r_arr)
        tk = _clone_tokenizer(self.tokenizer, return_set=True)
        ll = tk.tokenize_batch(l_arr.fill_null(""))
        rl = tk.tokenize_batch(r_arr.fill_null(""))
        o, nl, nr = batch_overlap_counts(ll, rl)
        return o, nl, nr, miss

    def filter_candset(self, candset, candset_l_key_attr, candset_r_key_attr,
                       ltable, rtable, l_key_attr, r_key_attr,
                       l_filter_attr, r_filter_attr, n_jobs=1,
                       show_progress=False, num_partitions=DEFAULT_NUM_BUCKETS):
        from rayssj.matcher import _L_STR, _R_STR, fetch_pair_strings

        cand = _as_dataset(candset)
        orig_cols = cand.schema().names
        from rayssj.joins import _probe_empty

        if _probe_empty(cand):
            import ray.data as rd

            from rayssj.validation import _schema_of

            sch = _schema_of(cand)
            return rd.from_arrow(pa.schema(
                [pa.field(c, sch.field(c).type) for c in orig_cols]).empty_table())
        fetched = fetch_pair_strings(
            cand, candset_l_key_attr, candset_r_key_attr, ltable, rtable,
            l_key_attr, r_key_attr, l_filter_attr, r_filter_attr,
            num_partitions=num_partitions)
        flt = self
        if type(self)._keep_batch is not None:
            # vectorized §2.3 bounds over the whole batch — no per-pair
            # re-tokenization / re-sorting (identical keep-set to the scalar
            # path; tests/test_filters.py parity matrix)
            def refine_batch(batch: pa.Table) -> pa.Table:
                keep = flt._keep_batch(batch[_L_STR], batch[_R_STR])
                return batch.filter(pa.array(keep))

            return (fetched.map_batches(refine_batch, batch_format="pyarrow",
                                        zero_copy_batch=True)
                    .select_columns(list(orig_cols)))

        def refine(batch: pd.DataFrame) -> pd.DataFrame:
            keep = [not flt.filter_pair(a, b)
                    for a, b in zip(batch[_L_STR], batch[_R_STR])]
            return batch.loc[keep]

        return fetched.map_batches(refine, batch_format="pandas").select_columns(list(orig_cols))

    # ---- shared filter_tables machinery -------------------------------------

    def _blocking_candset(self, ltable, rtable, l_key_attr, r_key_attr,
                          l_filter_attr, r_filter_attr, kernel_factory,
                          sim_measure_type, threshold, allow_missing,
                          l_out_attrs=None, r_out_attrs=None,
                          l_out_prefix="l_", r_out_prefix="r_",
                          self_join=False, num_buckets=None):
        import ray.data as rd

        from rayssj.joins import _shape_output

        from rayssj.joins import _ensure_parallel, default_num_buckets

        auto_buckets = num_buckets is None
        if auto_buckets:
            num_buckets = default_num_buckets()

        l_raw = _as_dataset(ltable)
        r_raw = l_raw if self_join else _as_dataset(rtable)
        l_ds = _ensure_parallel(l_raw)
        r_ds = l_ds if self_join else _ensure_parallel(r_raw)
        from rayssj.joins import _empty_pairs_output, _probe_empty
        from rayssj.validation import _schema_of

        if _probe_empty(l_raw) or (not self_join and _probe_empty(r_raw)):
            return _empty_pairs_output(_schema_of(l_raw), _schema_of(r_raw),
                                       l_key_attr, r_key_attr, l_out_attrs,
                                       r_out_attrs, l_out_prefix, r_out_prefix,
                                       out_sim_score=False)
        tk = _clone_tokenizer(self.tokenizer, return_set=True)
        l_tok = _tokenize_stage(l_ds, l_key_attr, l_filter_attr, tk, keep_string=False)
        r_tok = l_tok if self_join else _tokenize_stage(r_ds, r_key_attr, r_filter_attr, tk, keep_string=False)
        l_clean = _drop_missing(l_tok)
        r_clean = l_clean if self_join else _drop_missing(r_tok)
        order = build_token_order(l_tok) if self_join else build_token_order(l_tok, r_tok)
        order_ref = ray.put(order)
        from rayssj.joins import (
            _BCAST_RANKS_MAX_BYTES,
            _build_ranks_broadcast,
            _ranks_bcast_estimate,
            make_explode_fn,
        )

        ranks_bcast = None
        est = _ranks_bcast_estimate(order)
        if est is not None and est <= _BCAST_RANKS_MAX_BYTES:
            rank_np = np.uint16 if len(order) < 65536 else np.int32
            ranks_bcast = _build_ranks_broadcast(l_clean, r_clean, order_ref,
                                                 self_join, rank_np)
        if ranks_bcast is not None and auto_buckets:
            from rayssj.joins import bcast_num_buckets

            num_buckets = bcast_num_buckets(order)
        expl_kwargs = dict(sim_measure_type=sim_measure_type, threshold=threshold,
                           num_buckets=num_buckets, self_mode=self_join,
                           emit_heavy=ranks_bcast is None)
        l_expl = l_clean.map_batches(
            make_explode_fn(_SetSimExploder, order_ref, side=0, **expl_kwargs),
            batch_format="pyarrow", zero_copy_batch=True)
        if self_join:
            exploded = l_expl
        else:
            r_expl = r_clean.map_batches(
                make_explode_fn(_SetSimExploder, order_ref, side=1, **expl_kwargs),
                batch_format="pyarrow", zero_copy_batch=True)
            exploded = l_expl.union(r_expl)
        kernel = kernel_factory(self_join, ranks_bcast)
        pairs = _bucket_groupby(exploded).map_groups(kernel, batch_format="pyarrow")
        if "_sim_score" in pairs.schema().names:
            pairs = pairs.drop_columns(["_sim_score"])
        if allow_missing:
            for mds in _missing_pair_datasets(l_clean, l_tok, r_tok, self_join):
                pairs = pairs.union(mds.drop_columns(["_sim_score"]))
        return _shape_output(pairs, l_ds, r_ds, l_key_attr, r_key_attr,
                             l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix,
                             out_sim_score=False, num_buckets=num_buckets)


class OverlapFilter(_BaseFilter):
    """Prune pairs whose distinct-token overlap fails ``comp_op overlap_size``
    [ref: filter/overlap_filter.py:~20 †U]."""

    def __init__(self, tokenizer, overlap_size=1, comp_op=">=", allow_missing=False):
        validate_tokenizer(tokenizer)
        if overlap_size <= 0:
            raise AssertionError("overlap_size should be greater than 0")
        # restricted to lower-bounded operators: shared-prefix-token blocking
        # in filter_tables can only surface pairs with >=1 shared token, so
        # '<'/'<='/'!=' would silently drop every zero-overlap pair there and
        # diverge from filter_pair on the same instance (ADVICE r01)
        if comp_op not in (">=", ">", "="):
            raise AssertionError("comp_op for OVERLAP should be one of >=, > or =")
        self.tokenizer = tokenizer
        self.overlap_size = overlap_size
        self.comp_op = comp_op
        self.allow_missing = allow_missing

    def filter_pair(self, lstring, rstring) -> bool:
        if _is_missing(lstring) or _is_missing(rstring):
            return not self.allow_missing
        lt = set(self.tokenizer.tokenize(lstring))
        rt = set(self.tokenizer.tokenize(rstring))
        return not COMP_OP_MAP[self.comp_op](len(lt & rt), self.overlap_size)

    def _keep_batch(self, l_arr, r_arr) -> np.ndarray:
        o, _, _, miss = self._tok_sets_batch(l_arr, r_arr)
        keep = COMP_OP_MAP[self.comp_op](o, self.overlap_size)
        keep[miss] = self.allow_missing
        return keep

    def filter_tables(self, ltable, rtable, l_key_attr, r_key_attr,
                      l_filter_attr, r_filter_attr,
                      l_out_attrs=None, r_out_attrs=None,
                      l_out_prefix="l_", r_out_prefix="r_",
                      n_jobs=1, show_progress=False, self_join=False,
                      num_buckets=None):
        factory = lambda sj, rref: make_set_sim_bucket_kernel(
            fu.OVERLAP, self.overlap_size, self.comp_op, self_join=sj,
            ranks_ref=rref)
        return self._blocking_candset(
            ltable, rtable, l_key_attr, r_key_attr, l_filter_attr, r_filter_attr,
            factory, fu.OVERLAP, self.overlap_size, self.allow_missing,
            l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix,
            self_join, num_buckets)


class _SimMeasureFilter(_BaseFilter):
    def __init__(self, tokenizer, sim_measure_type, threshold,
                 allow_empty=True, allow_missing=False):
        validate_tokenizer(tokenizer)
        validate_threshold(threshold, sim_measure_type)
        self.tokenizer = tokenizer
        self.sim_measure_type = sim_measure_type
        self.threshold = threshold
        self.allow_empty = allow_empty
        self.allow_missing = allow_missing

    def _tok_sets(self, lstring, rstring):
        lt = self.tokenizer.tokenize(lstring)
        rt = self.tokenizer.tokenize(rstring)
        return list(dict.fromkeys(lt)), list(dict.fromkeys(rt))


class SizeFilter(_SimMeasureFilter):
    """Prune pairs whose token-set sizes are incompatible with the threshold
    [ref: filter/size_filter.py:~20 †U]."""

    def filter_pair(self, lstring, rstring) -> bool:
        if _is_missing(lstring) or _is_missing(rstring):
            return not self.allow_missing
        lt, rt = self._tok_sets(lstring, rstring)
        if len(lt) == 0 and len(rt) == 0:
            return not self.allow_empty
        lb = fu.get_size_lower_bound(len(lt), self.sim_measure_type, self.threshold)
        ub = fu.get_size_upper_bound(len(lt), self.sim_measure_type, self.threshold)
        return not (lb <= len(rt) <= ub)

    def _keep_batch(self, l_arr, r_arr) -> np.ndarray:
        # sizes-only bound: skip the overlap computation entirely
        from rayssj.joins import _clone_tokenizer
        from rayssj.tokenizers import _list_parts, as_string_array

        l_arr = as_string_array(l_arr)
        r_arr = as_string_array(r_arr)
        miss = _null_mask(l_arr) | _null_mask(r_arr)
        tk = _clone_tokenizer(self.tokenizer, return_set=True)
        _, nl = _list_parts(tk.tokenize_batch(l_arr.fill_null("")))
        _, nr = _list_parts(tk.tokenize_batch(r_arr.fill_null("")))
        lb = fu.get_size_lower_bound(nl, self.sim_measure_type, self.threshold)
        ub = fu.get_size_upper_bound(nl, self.sim_measure_type, self.threshold)
        keep = (nr >= lb) & (nr <= ub)
        keep[(nl == 0) & (nr == 0)] = self.allow_empty
        keep[miss] = self.allow_missing
        return keep

    def filter_tables(self, ltable, rtable, l_key_attr, r_key_attr,
                      l_filter_attr, r_filter_attr,
                      l_out_attrs=None, r_out_attrs=None,
                      l_out_prefix="l_", r_out_prefix="r_",
                      n_jobs=1, show_progress=False, self_join=False,
                      num_buckets=None):
        """Size-bucket blocking: r-records land in the group of their own set
        size; l-records are exploded to every compatible size — each candidate
        pair materialises in exactly ONE group (no dedup shuffle needed)."""
        import ray.data as rd

        from rayssj.joins import _shape_output

        from rayssj.joins import _ensure_parallel, default_num_buckets

        if num_buckets is None:
            num_buckets = default_num_buckets()

        l_raw = _as_dataset(ltable)
        r_raw = l_raw if self_join else _as_dataset(rtable)
        l_ds = _ensure_parallel(l_raw)
        r_ds = l_ds if self_join else _ensure_parallel(r_raw)
        from rayssj.joins import _empty_pairs_output, _probe_empty
        from rayssj.validation import _schema_of

        if _probe_empty(l_raw) or (not self_join and _probe_empty(r_raw)):
            return _empty_pairs_output(_schema_of(l_raw), _schema_of(r_raw),
                                       l_key_attr, r_key_attr, l_out_attrs,
                                       r_out_attrs, l_out_prefix, r_out_prefix,
                                       out_sim_score=False)
        tk = _clone_tokenizer(self.tokenizer, return_set=True)
        l_tok = _tokenize_stage(l_ds, l_key_attr, l_filter_attr, tk, keep_string=False)
        r_tok = l_tok if self_join else _tokenize_stage(r_ds, r_key_attr, r_filter_attr, tk, keep_string=False)
        l_clean = _drop_missing(l_tok)
        r_clean = l_clean if self_join else _drop_missing(r_tok)
        measure, threshold = self.sim_measure_type, self.threshold
        allow_empty = self.allow_empty

        def r_emit(batch: pa.Table) -> pa.Table:
            lens = pc.list_value_length(batch[TOKENS_COL]).fill_null(0)
            sizes = lens.to_numpy(zero_copy_only=False).astype(np.int64)
            mask = np.ones(len(sizes), dtype=bool)
            if not allow_empty:
                mask = sizes > 0
            keys = batch["key"].combine_chunks() if isinstance(batch["key"], pa.ChunkedArray) else batch["key"]
            idx = np.nonzero(mask)[0]
            return pa.table({"gsize": pa.array(sizes[idx]),
                             "side": pa.array(np.ones(len(idx), dtype=np.int8)),
                             "sz": pa.array(sizes[idx]),
                             "key": keys.take(pa.array(idx))})

        # NOTE: the l-side size explosion upper bound is clamped per batch to the
        # batch max size — a global max would be exact but needs a pass; instead
        # r-side membership in the group makes any overshoot harmless (groups
        # for non-existent sizes are simply empty).
        def l_explode_unclamped(batch: pa.Table) -> pa.Table:
            lens = pc.list_value_length(batch[TOKENS_COL]).fill_null(0)
            sizes = lens.to_numpy(zero_copy_only=False).astype(np.int64)
            lb = fu.get_size_lower_bound(sizes, measure, threshold)
            ub = fu.get_size_upper_bound(sizes, measure, threshold)
            cap = int(self._global_max_size) if self._global_max_size is not None else None
            if cap is not None:
                ub = np.minimum(ub, cap)
            if not allow_empty:
                lb = np.maximum(lb, 1)
            width = np.maximum(ub - lb + 1, 0)
            row_ids = np.repeat(np.arange(len(sizes), dtype=np.int64), width)
            first = np.zeros(len(sizes), dtype=np.int64)
            np.cumsum(width[:-1], out=first[1:])
            tgt = lb[row_ids] + (np.arange(int(width.sum()), dtype=np.int64)
                                 - first[row_ids])
            keys = batch["key"].combine_chunks() if isinstance(batch["key"], pa.ChunkedArray) else batch["key"]
            return pa.table({"gsize": pa.array(tgt),
                             "side": pa.array(np.zeros(len(tgt), dtype=np.int8)),
                             "sz": pa.array(sizes[row_ids]),
                             "key": keys.take(pa.array(row_ids))})

        # global max r-size bounds the explosion exactly
        self._global_max_size = r_clean.map_batches(
            lambda t: pa.table({"m": pa.array([int(np.max(
                pc.list_value_length(t[TOKENS_COL]).fill_null(0).to_numpy(zero_copy_only=False),
                initial=0))], type=pa.int64())}),
            batch_format="pyarrow").max("m")

        l_sz = l_clean.map_batches(l_explode_unclamped, batch_format="pyarrow")
        r_sz = r_clean.map_batches(r_emit, batch_format="pyarrow")

        self_mode = self_join
        cap_val = int(self._global_max_size) if self._global_max_size is not None else None

        def pair_kernel(tbl: pa.Table) -> pa.Table:
            keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
            side = tbl["side"].to_numpy(zero_copy_only=False)
            gl = np.nonzero(side == 0)[0]
            gr = np.nonzero(side == 1)[0]
            empty = pa.table({"l_key": pa.array([], type=keys.type),
                              "r_key": pa.array([], type=keys.type)})
            if len(gl) == 0 or len(gr) == 0:
                return empty
            if self_mode:
                # emit-at-min-size-group rule (no global dedup shuffle): a
                # self-join pair with sizes (sl, g) is also generated in
                # group sl when g's explode range covers sl — emit it HERE
                # only when this group is the smaller one or the only one
                g = int(tbl["gsize"][0].as_py())
                sl = tbl["sz"].to_numpy(zero_copy_only=False)[gl]
                ga = np.array([g], dtype=np.int64)
                lb_g = int(fu.get_size_lower_bound(ga, measure, threshold)[0])
                ub_g = int(fu.get_size_upper_bound(ga, measure, threshold)[0])
                if cap_val is not None:
                    ub_g = min(ub_g, cap_val)
                if not allow_empty:
                    lb_g = max(lb_g, 1)
                other_has_it = (sl >= lb_g) & (sl <= ub_g)
                keep_l = (np.int64(g) <= sl) | ~other_has_it
                gl = gl[keep_l]
                if len(gl) == 0:
                    return empty
            li = np.repeat(gl, len(gr))
            ri = np.tile(gr, len(gl))
            lk = keys.take(pa.array(li))
            rk = keys.take(pa.array(ri))
            if self_mode:
                m = pc.not_equal(lk, rk)
                lk, rk = lk.filter(m), rk.filter(m)
                swap = pc.greater(lk, rk)
                lk, rk = pc.if_else(swap, rk, lk), pc.if_else(swap, lk, rk)
                tb = pa.table({"l_key": lk, "r_key": rk})
                # same-size pairs appear as (x,y) AND (y,x) within this group
                df = tb.to_pandas().drop_duplicates()
                return pa.Table.from_pandas(df, preserve_index=False)\
                    .replace_schema_metadata(None)
            return pa.table({"l_key": lk, "r_key": rk})

        pairs = l_sz.union(r_sz).groupby("gsize").map_groups(
            pair_kernel, batch_format="pyarrow")
        if self.allow_missing:
            for mds in _missing_pair_datasets(l_clean, l_tok, r_tok, self_join):
                pairs = pairs.union(mds.drop_columns(["_sim_score"]))
        return _shape_output(pairs, l_ds, r_ds, l_key_attr, r_key_attr,
                             l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix,
                             out_sim_score=False, num_buckets=num_buckets)


class PrefixFilter(_SimMeasureFilter):
    """Prune pairs with no shared prefix token [ref: filter/prefix_filter.py:~20 †U]."""

    def filter_pair(self, lstring, rstring) -> bool:
        if _is_missing(lstring) or _is_missing(rstring):
            return not self.allow_missing
        lt, rt = self._tok_sets(lstring, rstring)
        if len(lt) == 0 and len(rt) == 0:
            return not self.allow_empty
        if len(lt) == 0 or len(rt) == 0:
            return True
        lo, ro, _ = _pair_local_order(lt, rt)
        pl = fu.get_prefix_length(len(lo), self.sim_measure_type, self.threshold,
                                  self.tokenizer)
        pr = fu.get_prefix_length(len(ro), self.sim_measure_type, self.threshold,
                                  self.tokenizer)
        return len(set(lo[:pl]) & set(ro[:pr])) == 0

    def _keep_batch(self, l_arr, r_arr) -> np.ndarray:
        # Pair-local ordering closed form: freq ∈ {1,2}, so every side-unique
        # token ranks below every shared token — the j-th smallest shared
        # token sits at position (n_side − overlap) + j of each ordered list,
        # hence ∃ shared-in-both-prefixes ⇔ o>0 ∧ pl>nl−o ∧ pr>nr−o.
        o, nl, nr, miss = self._tok_sets_batch(l_arr, r_arr)
        pl = fu.get_prefix_length(nl, self.sim_measure_type, self.threshold,
                                  self.tokenizer)
        pr = fu.get_prefix_length(nr, self.sim_measure_type, self.threshold,
                                  self.tokenizer)
        keep = (o > 0) & (pl > nl - o) & (pr > nr - o)
        keep[(nl == 0) & (nr == 0)] = self.allow_empty
        keep[miss] = self.allow_missing
        return keep

    def filter_tables(self, ltable, rtable, l_key_attr, r_key_attr,
                      l_filter_attr, r_filter_attr,
                      l_out_attrs=None, r_out_attrs=None,
                      l_out_prefix="l_", r_out_prefix="r_",
                      n_jobs=1, show_progress=False, self_join=False,
                      num_buckets=None):
        factory = lambda sj, rref: make_filter_bucket_kernel(
            "prefix", self.sim_measure_type, self.threshold, self_join=sj,
            ranks_ref=rref)
        return self._blocking_candset(
            ltable, rtable, l_key_attr, r_key_attr, l_filter_attr, r_filter_attr,
            factory, self.sim_measure_type, self.threshold, self.allow_missing,
            l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix,
            self_join, num_buckets)


class PositionFilter(_SimMeasureFilter):
    """Prefix + PPJoin positional bound [ref: filter/position_filter.py:~20 †U]."""

    def filter_pair(self, lstring, rstring) -> bool:
        if _is_missing(lstring) or _is_missing(rstring):
            return not self.allow_missing
        lt, rt = self._tok_sets(lstring, rstring)
        if len(lt) == 0 and len(rt) == 0:
            return not self.allow_empty
        if len(lt) == 0 or len(rt) == 0:
            return True
        lo, ro, rank = _pair_local_order(lt, rt)
        pl = fu.get_prefix_length(len(lo), self.sim_measure_type, self.threshold,
                                  self.tokenizer)
        pr = fu.get_prefix_length(len(ro), self.sim_measure_type, self.threshold,
                                  self.tokenizer)
        shared = set(lo[:pl]) & set(ro[:pr])
        if not shared:
            return True
        ot = fu.get_overlap_threshold(len(lo), len(ro), self.sim_measure_type,
                                      self.threshold, self.tokenizer)
        last = max(shared, key=lambda t: rank[t])
        pos_l = lo.index(last)
        pos_r = ro.index(last)
        bound = len(shared) + min(len(lo) - pos_l - 1, len(ro) - pos_r - 1)
        return bound < ot

    def _keep_batch(self, l_arr, r_arr) -> np.ndarray:
        # Same closed form as PrefixFilter._keep_batch: with u = n − o
        # side-unique tokens ranked first, #(shared in both prefixes) =
        # clip(min(pl−ul, pr−ur), 0, o) and the LAST such token sits at
        # positions (ul + cnt − 1, ur + cnt − 1) — the PPJoin bound follows.
        o, nl, nr, miss = self._tok_sets_batch(l_arr, r_arr)
        pl = fu.get_prefix_length(nl, self.sim_measure_type, self.threshold,
                                  self.tokenizer)
        pr = fu.get_prefix_length(nr, self.sim_measure_type, self.threshold,
                                  self.tokenizer)
        ul, ur = nl - o, nr - o
        cnt = np.clip(np.minimum(pl - ul, pr - ur), 0, o)
        ot = fu.get_overlap_threshold(nl, nr, self.sim_measure_type,
                                      self.threshold, self.tokenizer)
        pos_l = ul + cnt - 1
        pos_r = ur + cnt - 1
        bound = cnt + np.minimum(nl - pos_l - 1, nr - pos_r - 1)
        keep = (cnt > 0) & (bound >= ot)
        keep[(nl == 0) & (nr == 0)] = self.allow_empty
        keep[miss] = self.allow_missing
        return keep

    def filter_tables(self, ltable, rtable, l_key_attr, r_key_attr,
                      l_filter_attr, r_filter_attr,
                      l_out_attrs=None, r_out_attrs=None,
                      l_out_prefix="l_", r_out_prefix="r_",
                      n_jobs=1, show_progress=False, self_join=False,
                      num_buckets=None):
        factory = lambda sj, rref: make_filter_bucket_kernel(
            "position", self.sim_measure_type, self.threshold, self_join=sj,
            ranks_ref=rref)
        return self._blocking_candset(
            ltable, rtable, l_key_attr, r_key_attr, l_filter_attr, r_filter_attr,
            factory, self.sim_measure_type, self.threshold, self.allow_missing,
            l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix,
            self_join, num_buckets)


class SuffixFilter(_SimMeasureFilter):
    """Recursive suffix Hamming-bound filter [ref: filter/suffix_filter.py:~25 †U].

    ``filter_pair`` implements the PPJoin+ SuffixFilter divide-&-conquer bound
    (Xiao et al., WWW'08), depth-bounded; any valid Hamming lower bound
    preserves completeness, so pruning is conservative by construction.
    ``filter_tables`` is the documented O(n·m) pair scan (the reference has no
    index for this filter either).
    """

    MAX_DEPTH = 2

    def filter_pair(self, lstring, rstring) -> bool:
        if _is_missing(lstring) or _is_missing(rstring):
            return not self.allow_missing
        lt, rt = self._tok_sets(lstring, rstring)
        if len(lt) == 0 and len(rt) == 0:
            return not self.allow_empty
        if len(lt) == 0 or len(rt) == 0:
            return True
        lo, ro, rank = _pair_local_order(lt, rt)
        pl = fu.get_prefix_length(len(lo), self.sim_measure_type, self.threshold,
                                  self.tokenizer)
        pr = fu.get_prefix_length(len(ro), self.sim_measure_type, self.threshold,
                                  self.tokenizer)
        shared = set(lo[:pl]) & set(ro[:pr])
        if not shared:
            return True
        ot = fu.get_overlap_threshold(len(lo), len(ro), self.sim_measure_type,
                                      self.threshold, self.tokenizer)
        # overlap can involve prefix tokens of EITHER side, so the only safe
        # suffix-overlap requirement is ot - pl - pr (cross prefix/suffix
        # matches bounded by the prefix lengths)
        need = ot - pl - pr
        ls = [rank[t] for t in lo[pl:]]
        rs = [rank[t] for t in ro[pr:]]
        if need <= 0:
            return False
        hmax = len(ls) + len(rs) - 2 * need
        if hmax < 0:
            return True
        lb = self._suffix_hamming_lb(ls, rs, hmax, 1)
        return lb > hmax

    def _suffix_hamming_lb(self, x, y, hmax, depth) -> int:
        """Lower bound on Hamming distance of ordered suffix token lists."""
        if len(x) > len(y):
            x, y = y, x
        if not x or not y or depth > self.MAX_DEPTH:
            return abs(len(x) - len(y))
        mid = len(y) // 2
        w = y[mid]
        import bisect

        # exact partition at w's true position: every element of x_l is < w
        # and of x_r is > w, so cross-side matches are impossible and the
        # H(x_l,y_l)+H(x_r,y_r)+diff decomposition is a valid lower bound
        p = bisect.bisect_left(x, w)
        found = p < len(x) and x[p] == w
        diff = 0 if found else 1
        xl, xr = x[:p], x[p + (1 if found else 0):]
        yl, yr = y[:mid], y[mid + 1:]
        h = abs(len(xl) - len(yl)) + abs(len(xr) - len(yr)) + diff
        if h > hmax:
            return h
        hl = self._suffix_hamming_lb(xl, yl, hmax - abs(len(xr) - len(yr)) - diff,
                                     depth + 1)
        h = hl + abs(len(xr) - len(yr)) + diff
        if h > hmax:
            return h
        hr = self._suffix_hamming_lb(xr, yr, hmax - hl - diff, depth + 1)
        return hl + hr + diff

    def filter_tables(self, ltable, rtable, l_key_attr, r_key_attr,
                      l_filter_attr, r_filter_attr,
                      l_out_attrs=None, r_out_attrs=None,
                      l_out_prefix="l_", r_out_prefix="r_",
                      n_jobs=1, show_progress=False, self_join=False,
                      num_buckets=None):
        """Prefix-blocked candidates refined per pair with ``filter_pair``.

        Any pair surviving the suffix filter must share a prefix token
        (``filter_pair`` prunes zero-shared-prefix pairs outright), so the
        distributed prefix blocking generates a superset of the output and
        the per-pair refinement runs only on candidates — replacing the
        round-1 O(n·m) broadcast scan of the whole left table. Empty-token
        pairs (kept by filter_pair when allow_empty) can't share a prefix
        token, so they're re-added from the bounded empty-key side path.
        """
        import ray.data as rd

        from rayssj.joins import (
            _empty_token_keys,
            _pairs_table,
            _rename_ds,
            _shape_output,
            _tokenize_stage,
        )

        l_ds = _as_dataset(ltable)
        r_ds = l_ds if self_join else _as_dataset(rtable)
        pf = PrefixFilter(self.tokenizer, self.sim_measure_type, self.threshold,
                          allow_missing=self.allow_missing)
        cand = pf.filter_tables(ltable, rtable, l_key_attr, r_key_attr,
                                l_filter_attr, r_filter_attr,
                                self_join=self_join, num_buckets=num_buckets)
        refined = self.filter_candset(
            cand, "l_" + l_key_attr, "r_" + r_key_attr, l_ds, r_ds,
            l_key_attr, r_key_attr, l_filter_attr, r_filter_attr)
        pairs = _rename_ds(refined, {"l_" + l_key_attr: "l_key",
                                     "r_" + r_key_attr: "r_key"})

        if self.allow_empty:
            tk = _clone_tokenizer(self.tokenizer, return_set=True)
            l_tok = _tokenize_stage(l_ds, l_key_attr, l_filter_attr, tk,
                                    keep_string=False)
            l_empty = _empty_token_keys(l_tok)
            r_empty = l_empty if self_join else _empty_token_keys(
                _tokenize_stage(r_ds, r_key_attr, r_filter_attr, tk,
                                keep_string=False))
            ek_l, ek_r = [], []
            if self_join:
                for i, a in enumerate(l_empty):
                    for b in l_empty[i + 1:]:
                        lo, hi = (a, b) if a <= b else (b, a)
                        ek_l.append(lo)
                        ek_r.append(hi)
            else:
                ek_l = [a for a in l_empty for _ in r_empty]
                ek_r = [b for _ in l_empty for b in r_empty]
            if ek_l:
                tbl = _pairs_table(ek_l, ek_r, [1.0] * len(ek_l))
                pairs = pairs.union(rd.from_arrow(tbl.drop_columns(["_sim_score"])))

        return _shape_output(pairs, l_ds, r_ds, l_key_attr, r_key_attr,
                             l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix,
                             out_sim_score=False, num_buckets=num_buckets)
