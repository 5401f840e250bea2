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


_MATRIX_GROUP_MIN = 8     # below this, per-pair intersect beats matmul setup
_PAIR_CHUNK_ROWS = 1024   # l-rows per matmul chunk (bounds pair-matrix memory)


def _member_matrices(rv, ro, mem, pl, build_prefix=True):
    """Local-vocab membership matrices for group members ``mem``.

    Returns (vocab, M, P): M[i, v] = 1 iff vocab[v] in member i's token set;
    P restricted to each member's prefix. float32 so the pairwise overlap
    matrix is one BLAS matmul.
    """
    lengths = (ro[mem + 1] - ro[mem]).astype(np.int64)
    total = int(lengths.sum())
    flat_idx = np.repeat(ro[mem], lengths) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.concatenate(([0], np.cumsum(lengths[:-1]))), lengths))
    flat_vals = rv[flat_idx]
    vocab = np.unique(flat_vals)
    col = np.searchsorted(vocab, flat_vals)
    rows = np.repeat(np.arange(len(mem), dtype=np.int64), lengths)
    M = np.zeros((len(mem), len(vocab)), dtype=np.float32)
    M[rows, col] = 1.0
    P = None
    if build_prefix:
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.concatenate(([0], np.cumsum(lengths[:-1]))), lengths))
        in_pref = within < np.repeat(pl[mem], lengths)
        P = np.zeros_like(M)
        P[rows[in_pref], col[in_pref]] = 1.0
    return vocab, M, P


def make_set_sim_bucket_kernel(sim_measure_type: str, threshold: float,
                               comp_op: str, self_join: bool):
    """Kernel factory for one groupby("bucket") stage of a set-sim join.

    Input group schema: ptok:int64, pos:int32, side:int8, key:any, size:int32,
    pl:int32, ranks:list<int64> (sorted). Output: l_key, r_key, _sim_score.

    Large shared-token groups are verified with chunked float32 matmuls over a
    local-vocab membership matrix (overlap = M_l @ M_r.T; cross-bucket dedup =
    zero shared prefix tokens ranked below the group token); tiny groups use a
    per-pair sorted-intersect fallback. This replaces the reference's
    per-probe index walk [ref: join/set_sim_join_py.py:~60-200 †U] with
    BLAS-vectorized batch verification.
    """
    comp_fn = COMP_OP_MAP[comp_op]
    is_oc = sim_measure_type == "OVERLAP_COEFFICIENT"

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

        order = np.argsort(ptok, kind="stable")
        pt_s = ptok[order]
        bounds = np.nonzero(np.diff(pt_s))[0] + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pt_s)]))

        out_l, out_r, out_s = [], [], []

        def emit(li, ri, sim):
            out_l.append(np.asarray(li))
            out_r.append(np.asarray(ri))
            out_s.append(np.asarray(sim, dtype=np.float64))

        def _small_group(gl, gr, w, li_is_ri):
            if li_is_ri:
                n = len(gl)
                iu, ju = np.triu_indices(n, k=1)
                li, ri = gl[iu], gl[ju]
            else:
                li = np.repeat(gl, len(gr))
                ri = np.tile(gr, len(gl))
            n1, n2 = size[li], size[ri]
            ot = get_overlap_threshold(n1, n2, sim_measure_type, threshold)
            feasible = np.minimum(n1, n2) >= ot
            ub = 1 + np.minimum(n1 - pos[li] - 1, n2 - pos[ri] - 1)
            feasible &= ub >= ot
            li, ri = li[feasible], ri[feasible]
            if len(li) == 0:
                return
            if is_oc:
                small_is_l = size[li] <= size[ri]
                pl_l = np.where(small_is_l, pl[li], size[li])
                pl_r = np.where(small_is_l, size[ri], pl[ri])
            else:
                pl_l, pl_r = pl[li], pl[ri]
            first, overlap = _first_shared_prefix(rv, ro, li, ri, pl_l, pl_r)
            keep = first == w
            li, ri, overlap = li[keep], ri[keep], overlap[keep]
            if len(li) == 0:
                return
            sim = compute_sim(sim_measure_type, overlap, size[li], size[ri])
            keep = comp_fn(sim, threshold)
            if keep.any():
                emit(li[keep], ri[keep], sim[keep])

        def _big_group(g, l_loc, r_loc, w):
            # membership matrices over the group's local vocabulary
            vocab, M, P = _member_matrices(rv, ro, g, pl)
            w_idx = int(np.searchsorted(vocab, w))
            gl, gr = g[l_loc], g[r_loc]
            Mr = M[r_loc]
            Pb_r = P[r_loc, :w_idx]
            Mb_r = M[r_loc, :w_idx]
            sz_l_all, sz_r = size[gl], size[gr]
            pos_l_all, pos_r = pos[gl], pos[gr]
            pl_l_all, pl_r = pl[gl], pl[gr]
            for i0 in range(0, len(gl), _PAIR_CHUNK_ROWS):
                i1 = min(i0 + _PAIR_CHUNK_ROWS, len(gl))
                lc = l_loc[i0:i1]
                F = M[lc] @ Mr.T  # exact pairwise overlap counts
                n1 = sz_l_all[i0:i1][:, None]
                n2 = sz_r[None, :]
                ot = get_overlap_threshold(n1, n2, sim_measure_type, threshold)
                mask = np.minimum(n1, n2) >= ot
                ub = 1 + np.minimum(n1 - pos_l_all[i0:i1][:, None] - 1,
                                    n2 - pos_r[None, :] - 1)
                mask &= ub >= ot
                if self_join:
                    # upper triangle in GROUP-member coordinates (gl == gr == g)
                    mask &= (np.arange(i0, i1)[:, None] < np.arange(len(gr))[None, :])
                # cross-bucket dedup: no shared prefix token ranked below w
                if is_oc:
                    # prefix(small) x full(large): two asymmetric matmuls
                    S_pf = P[lc, :w_idx] @ Mb_r.T   # l-prefix · r-full
                    S_fp = M[lc, :w_idx] @ Pb_r.T   # l-full · r-prefix
                    l_small = n1 <= n2
                    before = np.where(l_small, S_pf, S_fp)
                    mask &= before == 0
                    # w itself must lie in the smaller side's true prefix
                    w_in_pref_l = (P[lc, w_idx] > 0)[:, None]
                    w_in_pref_r = (P[r_loc, w_idx] > 0)[None, :]
                    mask &= np.where(l_small, w_in_pref_l, w_in_pref_r)
                else:
                    before = P[lc, :w_idx] @ Pb_r.T
                    mask &= before == 0
                sim = compute_sim(sim_measure_type, F, n1, n2)
                mask &= comp_fn(sim, threshold)
                ii, jj = np.nonzero(mask)
                if len(ii):
                    emit(gl[i0:i1][ii], gr[jj], sim[ii, jj])

        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            g = order[s:e]
            w = pt_s[s]
            if self_join:
                gl = gr = g
                l_loc = r_loc = np.arange(len(g), dtype=np.int64)
            else:
                l_loc = np.nonzero(side[g] == 0)[0]
                r_loc = np.nonzero(side[g] == 1)[0]
                gl, gr = g[l_loc], g[r_loc]
                if len(gl) == 0 or len(gr) == 0:
                    continue
            if len(g) < _MATRIX_GROUP_MIN:
                _small_group(gl, gr, w, li_is_ri=self_join)
            else:
                _big_group(g, l_loc, r_loc, w)

        if not out_l:
            return empty
        li = np.concatenate(out_l)
        ri = np.concatenate(out_r)
        sim = np.concatenate(out_s)
        lk, rk = _emit_keys(keys, li, ri, normalize=self_join)
        return pa.table({"l_key": lk, "r_key": rk,
                         "_sim_score": pa.array(sim.astype(np.float64))})

    return kernel


def make_edit_distance_bucket_kernel(threshold: float, comp_op: str,
                                     self_join: bool, qval: int = 2):
    """Kernel for one bucket of the edit-distance join.

    Input group schema: ptok:int64, side:int8, key:any, slen:int32,
    dsize:int32 (distinct gram count), ranks:list<int64> (distinct sorted
    PREFIX ranks), grams:list<int64> (distinct sorted FULL gram set), s:string.

    Candidates pass (1) length filter |len_l - len_r| <= t, (2) q-gram count
    filter: distinct shared grams >= max(d_l, d_r) - q*t (each edit disturbs at
    most q gram types — standard count filtering), (3) emit-at-first-shared-
    prefix dedup — all vectorized via group-local membership matmuls — before
    the vectorized Levenshtein verification.
    """
    comp_fn = COMP_OP_MAP[comp_op]
    t = float(threshold)
    max_d = int(np.ceil(t))
    qt = int(qval * t)

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
        dsize = _np(tbl, "dsize")
        pv, po = _list_col_parts(tbl, "ranks")    # prefix sets
        gv, go = _list_col_parts(tbl, "grams")    # full distinct sets
        strs = tbl["s"].combine_chunks() if isinstance(tbl["s"], pa.ChunkedArray) else tbl["s"]

        order = np.argsort(ptok, kind="stable")
        pt_s = ptok[order]
        bounds = np.nonzero(np.diff(pt_s))[0] + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pt_s)]))

        cand_l, cand_r = [], []

        def _small(gl, gr, w):
            if self_join:
                n = len(gl)
                iu, ju = np.triu_indices(n, k=1)
                li, ri = gl[iu], gl[ju]
            else:
                li = np.repeat(gl, len(gr))
                ri = np.tile(gr, len(gl))
            m = np.abs(slen[li] - slen[ri]) <= t
            if self_join:
                m &= li != ri
            li, ri = li[m], ri[m]
            for k in range(len(li)):
                a, b = li[k], ri[k]
                shared_pref = np.intersect1d(pv[po[a]:po[a + 1]], pv[po[b]:po[b + 1]],
                                             assume_unique=True)
                if len(shared_pref) == 0 or shared_pref[0] != w:
                    continue
                ov = len(np.intersect1d(gv[go[a]:go[a + 1]], gv[go[b]:go[b + 1]],
                                        assume_unique=True))
                if ov < max(dsize[a], dsize[b]) - qt:
                    continue
                cand_l.append(np.array([a]))
                cand_r.append(np.array([b]))

        def _big(g, l_loc, r_loc, w):
            # membership matrices over local prefix / full-gram vocabularies
            pvocab, P, _ = _member_matrices(pv, po, g, None, build_prefix=False)
            gvocab, M, _ = _member_matrices(gv, go, g, None, build_prefix=False)
            w_idx = int(np.searchsorted(pvocab, w))
            gl, gr = g[l_loc], g[r_loc]
            Pb = P[:, :w_idx]
            for i0 in range(0, len(gl), _PAIR_CHUNK_ROWS):
                i1 = min(i0 + _PAIR_CHUNK_ROWS, len(gl))
                lc = l_loc[i0:i1]
                L1 = slen[gl[i0:i1]][:, None]
                L2 = slen[gr][None, :]
                mask = np.abs(L1 - L2) <= t
                if self_join:
                    mask &= (np.arange(i0, i1)[:, None] < np.arange(len(gr))[None, :])
                if not mask.any():
                    continue
                before = Pb[lc] @ Pb[r_loc].T
                mask &= before == 0
                if not mask.any():
                    continue
                F = M[lc] @ M[r_loc].T
                d1 = dsize[gl[i0:i1]][:, None]
                d2 = dsize[gr][None, :]
                mask &= F >= np.maximum(d1, d2) - qt
                ii, jj = np.nonzero(mask)
                if len(ii):
                    cand_l.append(gl[i0:i1][ii])
                    cand_r.append(gr[jj])

        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            g = order[s:e]
            w = pt_s[s]
            if self_join:
                gl = gr = g
                l_loc = r_loc = np.arange(len(g), dtype=np.int64)
            else:
                l_loc = np.nonzero(side[g] == 0)[0]
                r_loc = np.nonzero(side[g] == 1)[0]
                gl, gr = g[l_loc], g[r_loc]
                if len(gl) == 0 or len(gr) == 0:
                    continue
            if len(g) < _MATRIX_GROUP_MIN:
                _small(gl, gr, w)
            else:
                _big(g, l_loc, r_loc, w)

        if not cand_l:
            return empty
        li = np.concatenate(cand_l)
        ri = np.concatenate(cand_r)
        sl = strs.take(pa.array(li)).to_pylist()
        sr = strs.take(pa.array(ri)).to_pylist()
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
