"""In-bucket pair-generation + verification kernels.

The reference's probe loop [ref: py_stringsimjoin/join/set_sim_join_py.py:~60-200 †U]
walks an in-memory PositionIndex per r-record. Here there is NO driver-side
index (SURVEY.md §4 delta 1): prefix-token rows from both sides are
hash-bucketed (``bucket = ptok % NB``) and co-grouped by one
``groupby("bucket").map_groups`` shuffle; each bucket kernel rebuilds the
candidate structure transiently with numpy, applies the size/positional bounds
(§2.3), verifies exact overlaps on sorted rank arrays, and emits pairs.

Cross-bucket dedup is emit-at-first-shared-prefix-token: a candidate pair is
emitted ONLY in the group of the lowest-rank token its two prefixes share —
no second shuffle needed (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayssj.filter_utils import (
    COMP_OP_MAP,
    compute_sim,
    get_overlap_threshold,
)
from rayssj.levenshtein import levenshtein_pairs_capped


def _list_col_parts(tbl: pa.Table, name: str):
    col = tbl[name]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = pc.list_value_length(col).fill_null(0).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return values, offsets


def _np(tbl: pa.Table, name: str, dtype=np.int64):
    return tbl[name].to_numpy(zero_copy_only=False).astype(dtype)


def _group_pairs(ptok: np.ndarray, side: np.ndarray, self_join: bool):
    """Candidate (li, ri, gtok) index arrays for every shared-token group.

    Python loop is per GROUP (not per pair); inner pair-gen is numpy meshgrid.
    """
    order = np.argsort(ptok, kind="stable")
    pt_s = ptok[order]
    bounds = np.nonzero(np.diff(pt_s))[0] + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(pt_s)]))
    li_out, ri_out, tok_out = [], [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        g = order[s:e]
        if self_join:
            # combinations i<j within the group
            n = len(g)
            iu, ju = np.triu_indices(n, k=1)
            li, ri = g[iu], g[ju]
        else:
            gl = g[side[g] == 0]
            gr = g[side[g] == 1]
            if len(gl) == 0 or len(gr) == 0:
                continue
            li = np.repeat(gl, len(gr))
            ri = np.tile(gr, len(gl))
        li_out.append(li)
        ri_out.append(ri)
        tok_out.append(np.full(len(li), pt_s[s], dtype=np.int64))
    if not li_out:
        z = np.array([], dtype=np.int64)
        return z, z.copy(), z.copy()
    return np.concatenate(li_out), np.concatenate(ri_out), np.concatenate(tok_out)


def _first_shared_prefix(rv, ro, li, ri, pl_l, pl_r):
    """Per-pair: (first shared prefix token, full overlap count).

    rv/ro: flattened sorted rank values + row offsets; prefix of row i is
    rv[ro[i] : ro[i]+pl[i]] (pl <= row length).
    Returns (first_tok int64 array, overlap int64 array).
    """
    n = len(li)
    first = np.empty(n, dtype=np.int64)
    overlap = np.empty(n, dtype=np.int64)
    for k in range(n):
        a = rv[ro[li[k]]:ro[li[k] + 1]]
        b = rv[ro[ri[k]]:ro[ri[k] + 1]]
        inter = np.intersect1d(a, b, assume_unique=True)
        overlap[k] = len(inter)
        pa_ = np.searchsorted(a, inter)
        pb_ = np.searchsorted(b, inter)
        shared_pref = inter[(pa_ < pl_l[k]) & (pb_ < pl_r[k])]
        first[k] = shared_pref[0] if len(shared_pref) else -1
    return first, overlap


def _emit_keys(keys: pa.Array, li, ri, normalize: bool):
    lk = keys.take(pa.array(li, type=pa.int64()))
    rk = keys.take(pa.array(ri, type=pa.int64()))
    if normalize:
        swap = pc.greater(lk, rk)
        lk, rk = pc.if_else(swap, rk, lk), pc.if_else(swap, lk, rk)
    return lk, rk


def make_set_sim_bucket_kernel(sim_measure_type: str, threshold: float,
                               comp_op: str, self_join: bool,
                               out_count_only: bool = False):
    """Kernel factory for one groupby("bucket") stage of a set-sim join.

    Input group schema: ptok:int64, pos:int32, side:int8, key:any, size:int32,
    pl:int32, ranks:list<int64> (sorted). Output: l_key, r_key, _sim_score.
    """
    comp_fn = COMP_OP_MAP[comp_op]

    def kernel(tbl: pa.Table) -> pa.Table:
        keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
        key_type = keys.type
        empty = pa.table({"l_key": pa.array([], type=key_type),
                          "r_key": pa.array([], type=key_type),
                          "_sim_score": pa.array([], type=pa.float64())})
        if tbl.num_rows < 2:
            return empty
        ptok = _np(tbl, "ptok")
        side = _np(tbl, "side", np.int8)
        size = _np(tbl, "size")
        pl = _np(tbl, "pl")
        pos = _np(tbl, "pos")
        rv, ro = _list_col_parts(tbl, "ranks")

        li, ri, gtok = _group_pairs(ptok, side, self_join)
        if len(li) == 0:
            return empty
        n1, n2 = size[li], size[ri]
        ot = get_overlap_threshold(n1, n2, sim_measure_type, threshold)
        feasible = np.minimum(n1, n2) >= ot
        # PPJoin positional bound: overlap so far (1) + tokens after the probe
        # position in each ordered list [ref: filter/position_filter.py:~80 †U]
        ub = 1 + np.minimum(n1 - pos[li] - 1, n2 - pos[ri] - 1)
        feasible &= ub >= ot
        if self_join:
            feasible &= li != ri
        li, ri, gtok, ot = li[feasible], ri[feasible], gtok[feasible], ot[feasible]
        if len(li) == 0:
            return empty
        if sim_measure_type == "OVERLAP_COEFFICIENT":
            # true-prefix rule applies only to the smaller side; the larger
            # side's whole token set participates (see _SetSimExploder note)
            small_is_l = size[li] <= size[ri]
            pl_l = np.where(small_is_l, pl[li], size[li])
            pl_r = np.where(small_is_l, size[ri], pl[ri])
        else:
            pl_l, pl_r = pl[li], pl[ri]
        first, overlap = _first_shared_prefix(rv, ro, li, ri, pl_l, pl_r)
        keep = first == gtok
        li, ri, overlap = li[keep], ri[keep], overlap[keep]
        if len(li) == 0:
            return empty
        sim = compute_sim(sim_measure_type, overlap, size[li], size[ri])
        keep = comp_fn(sim, threshold)
        li, ri, sim = li[keep], ri[keep], sim[keep]
        if len(li) == 0:
            return empty
        lk, rk = _emit_keys(keys, li, ri, normalize=self_join)
        return pa.table({"l_key": lk, "r_key": rk,
                         "_sim_score": pa.array(sim.astype(np.float64))})

    return kernel


def make_edit_distance_bucket_kernel(threshold: float, comp_op: str,
                                     self_join: bool):
    """Kernel for one bucket of the edit-distance join.

    Input group schema: ptok:int64, side:int8, key:any, slen:int32,
    ranks:list<int64> (distinct sorted PREFIX ranks), s:string.
    Verification = vectorized Levenshtein across all candidate pairs at once.
    """
    comp_fn = COMP_OP_MAP[comp_op]
    t = int(threshold) if float(threshold).is_integer() else float(threshold)

    def kernel(tbl: pa.Table) -> pa.Table:
        keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
        key_type = keys.type
        empty = pa.table({"l_key": pa.array([], type=key_type),
                          "r_key": pa.array([], type=key_type),
                          "_sim_score": pa.array([], type=pa.float64())})
        if tbl.num_rows < 2:
            return empty
        ptok = _np(tbl, "ptok")
        side = _np(tbl, "side", np.int8)
        slen = _np(tbl, "slen")
        rv, ro = _list_col_parts(tbl, "ranks")

        li, ri, gtok = _group_pairs(ptok, side, self_join)
        if len(li) == 0:
            return empty
        feasible = np.abs(slen[li] - slen[ri]) <= float(threshold)
        if self_join:
            feasible &= li != ri
        li, ri, gtok = li[feasible], ri[feasible], gtok[feasible]
        if len(li) == 0:
            return empty
        # dedup: prefix arrays here are whole distinct-prefix rank sets
        pl_l = (ro[li + 1] - ro[li]).astype(np.int64)
        pl_r = (ro[ri + 1] - ro[ri]).astype(np.int64)
        first, _ = _first_shared_prefix(rv, ro, li, ri, pl_l, pl_r)
        keep = first == gtok
        li, ri = li[keep], ri[keep]
        if len(li) == 0:
            return empty
        strs = tbl["s"].combine_chunks() if isinstance(tbl["s"], pa.ChunkedArray) else tbl["s"]
        sl = strs.take(pa.array(li)).to_pylist()
        sr = strs.take(pa.array(ri)).to_pylist()
        max_d = int(np.ceil(float(threshold)))
        dist = levenshtein_pairs_capped(sl, sr, max_d)
        keep = comp_fn(dist, threshold) & (dist <= max_d)
        li, ri, dist = li[keep], ri[keep], dist[keep]
        if len(li) == 0:
            return empty
        lk, rk = _emit_keys(keys, li, ri, normalize=self_join)
        return pa.table({"l_key": lk, "r_key": rk,
                         "_sim_score": pa.array(dist.astype(np.float64))})

    return kernel


def make_filter_bucket_kernel(filter_type: str, sim_measure_type: str,
                              threshold: float, self_join: bool):
    """Bucket kernel for PrefixFilter / PositionFilter ``filter_tables``
    (SURVEY.md §2 #10, #11): emits candidate pairs WITHOUT verification.

    filter_type="prefix": any shared prefix token (emit-at-first-shared dedup).
    filter_type="position": additionally require the PPJoin positional bound —
    (# shared prefix tokens) + min tokens remaining after the LAST shared
    prefix position >= overlap threshold [ref: filter/position_filter.py:~80 †U].
    """

    def kernel(tbl: pa.Table) -> pa.Table:
        keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
        key_type = keys.type
        empty = pa.table({"l_key": pa.array([], type=key_type),
                          "r_key": pa.array([], type=key_type)})
        if tbl.num_rows < 2:
            return empty
        ptok = _np(tbl, "ptok")
        side = _np(tbl, "side", np.int8)
        size = _np(tbl, "size")
        pl = _np(tbl, "pl")
        rv, ro = _list_col_parts(tbl, "ranks")

        li, ri, gtok = _group_pairs(ptok, side, self_join)
        if len(li) == 0:
            return empty
        if self_join:
            m = li != ri
            li, ri, gtok = li[m], ri[m], gtok[m]
        if len(li) == 0:
            return empty
        n = len(li)
        keep = np.zeros(n, dtype=bool)
        pl_l, pl_r = pl[li], pl[ri]
        if filter_type == "position":
            ot = get_overlap_threshold(size[li], size[ri], sim_measure_type, threshold)
        for k in range(n):
            a = rv[ro[li[k]]:ro[li[k] + 1]]
            b = rv[ro[ri[k]]:ro[ri[k] + 1]]
            ap = a[:pl_l[k]]
            bp = b[:pl_r[k]]
            shared = np.intersect1d(ap, bp, assume_unique=True)
            if len(shared) == 0 or shared[0] != gtok[k]:
                continue
            if filter_type == "prefix":
                keep[k] = True
            else:
                last = shared[-1]
                pos_l = int(np.searchsorted(a, last))
                pos_r = int(np.searchsorted(b, last))
                bound = len(shared) + min(size[li[k]] - pos_l - 1,
                                          size[ri[k]] - pos_r - 1)
                keep[k] = bound >= ot[k]
        li, ri = li[keep], ri[keep]
        if len(li) == 0:
            return empty
        lk, rk = _emit_keys(keys, li, ri, normalize=self_join)
        return pa.table({"l_key": lk, "r_key": rk})

    return kernel
