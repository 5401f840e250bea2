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
    get_size_lower_bound,
    get_size_upper_bound,
)
from rayssj.levenshtein import levenshtein_pairs_capped
from rayssj import native as _nat


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


def _iter_cells(grp: np.ndarray, side: np.ndarray, self_join: bool):
    """Yield (g_indices, l_loc, r_loc, triu) per salted grid cell.

    A pure-self cell (diagonal of the salting grid, or unsalted self-join
    group) pairs via the upper triangle; any cell containing side-1 rows pairs
    side0 × side1 cross.
    """
    order = np.argsort(grp, kind="stable")
    gs = grp[order]
    bounds = np.nonzero(np.diff(gs))[0] + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(gs)]))
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        g = order[s:e]
        mixed = (side[g] == 1).any()
        if self_join and not mixed:
            loc = np.arange(len(g), dtype=np.int64)
            yield g, loc, loc, True
            continue
        l_loc = np.nonzero(side[g] == 0)[0]
        r_loc = np.nonzero(side[g] == 1)[0]
        if len(l_loc) == 0 or len(r_loc) == 0:
            continue
        yield g, l_loc, r_loc, False


def _group_pairs(grp: np.ndarray, ptok: np.ndarray, side: np.ndarray,
                 self_join: bool):
    """Candidate (li, ri, gtok) index arrays across all grid cells.

    Python loop is per CELL (not per pair); inner pair-gen is numpy meshgrid.
    """
    li_out, ri_out, tok_out = [], [], []
    for g, l_loc, r_loc, triu in _iter_cells(grp, side, self_join):
        if triu:
            iu, ju = np.triu_indices(len(g), k=1)
            li, ri = g[iu], g[ju]
        else:
            gl, gr = g[l_loc], g[r_loc]
            li = np.repeat(gl, len(gr))
            ri = np.tile(gr, len(gl))
        li_out.append(li)
        ri_out.append(ri)
        tok_out.append(np.full(len(li), ptok[g[0]], dtype=np.int64))
    if not li_out:
        z = np.array([], dtype=np.int64)
        return z, z.copy(), z.copy()
    return np.concatenate(li_out), np.concatenate(ri_out), np.concatenate(tok_out)


def _first_shared_prefix(rv, starts, lens, li, ri, pl_l, pl_r):
    """Per-pair: (first shared prefix token, full overlap count).

    Row i's sorted rank array is rv[starts[i] : starts[i]+lens[i]]; its prefix
    is the first pl[i] elements. Returns (first_tok, overlap) int64 arrays.
    """
    n = len(li)
    first = np.empty(n, dtype=np.int64)
    overlap = np.empty(n, dtype=np.int64)
    for k in range(n):
        a = rv[starts[li[k]]:starts[li[k]] + lens[li[k]]]
        b = rv[starts[ri[k]]:starts[ri[k]] + lens[ri[k]]]
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


_RANKS_BCAST_CACHE: dict = {}


def _ranks_bcast_get(ref):
    """Per-worker-process cache of the broadcast rank table (``ray.get`` of a
    local object is zero-copy shared memory, but the hex-keyed cache also
    skips the per-group call overhead)."""
    import ray

    k = ref.hex()
    hit = _RANKS_BCAST_CACHE.get(k)
    if hit is None:
        if len(_RANKS_BCAST_CACHE) > 3:
            _RANKS_BCAST_CACHE.clear()
        hit = ray.get(ref)
        _RANKS_BCAST_CACHE[k] = hit
    return hit


def _bcast_lookup(side_tab, kh):
    """Indices of key-hashes ``kh`` in one sorted broadcast side table."""
    h = side_tab["h"]
    if len(h) == 0:
        return np.zeros(len(kh), dtype=np.int64), np.zeros(len(kh), dtype=bool)
    idx = np.minimum(np.searchsorted(h, kh), len(h) - 1)
    return idx, h[idx] == kh


def _resolve_ranks_broadcast(tbl: pa.Table, ref):
    """Broadcast-mode counterpart of ``_split_heavy_light``: every group row
    is a LIGHT pair-gen row; rank slices come from the ``ray.put`` rank table
    (key-hash sorted, collision-checked at build time) instead of shuffled
    heavy rows. Returns the same tuple shape.
    """
    from rayssj.checkpoint import stable_hash64

    bc = _ranks_bcast_get(ref)
    keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
    side = _np(tbl, "side", np.int8)
    kh = stable_hash64(keys).to_numpy(zero_copy_only=False).view(np.uint64) \
        .astype(np.int64) % np.int64(2**62)
    if bc.get("s1") is not None:
        st = np.zeros(len(kh), dtype=np.int64)
        ln = np.zeros(len(kh), dtype=np.int64)
        found = np.zeros(len(kh), dtype=bool)
        # two-table join: side-1 rank slices are stored appended after side-0's
        # in one flat values array, so a single ``rv`` serves both sides
        for s, name in ((0, "s0"), (1, "s1")):
            sel = np.nonzero(side == s)[0]
            if len(sel) == 0:
                continue
            idx, ok = _bcast_lookup(bc[name], kh[sel])
            st[sel] = bc[name]["st"][idx]
            ln[sel] = bc[name]["ln"][idx]
            found[sel] = ok
    else:
        idx, found = _bcast_lookup(bc["s0"], kh)
        st, ln = bc["s0"]["st"][idx], bc["s0"]["ln"][idx]
    if not found.all():  # missing key (shouldn't happen) — bail safe
        keep = pa.array(found)
        tbl = tbl.filter(keep)
        keys = keys.filter(keep)
        side, st, ln = side[found], st[found], ln[found]
    return tbl, keys, side, st, ln, bc["rv"]


def _resolve_ed_broadcast(tbl: pa.Table, ref):
    """Edit-distance broadcast lookup: per-row (gram slice starts/lens into
    the shared flat gram array, string take-indices). Rows whose key is
    missing from the table (shouldn't happen) get ln=0 / sidx=0 — they can
    never produce a candidate because their gram sets read as empty."""
    from rayssj.checkpoint import stable_hash64

    bc = _ranks_bcast_get(ref)
    keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
    side = _np(tbl, "side", np.int8)
    kh = stable_hash64(keys).to_numpy(zero_copy_only=False).view(np.uint64) \
        .astype(np.int64) % np.int64(2**62)
    st = np.zeros(len(kh), dtype=np.int64)
    ln = np.zeros(len(kh), dtype=np.int64)
    sidx = np.zeros(len(kh), dtype=np.int64)
    sides = ((0, "s0"), (1, "s1")) if bc.get("s1") is not None else ((None, "s0"),)
    for s, name in sides:
        sel = np.arange(len(kh)) if s is None else np.nonzero(side == s)[0]
        if len(sel) == 0:
            continue
        idx, ok = _bcast_lookup(bc[name], kh[sel])
        st[sel] = np.where(ok, bc[name]["st"][idx], 0)
        ln[sel] = np.where(ok, bc[name]["ln"][idx], 0)
        sidx[sel] = np.where(ok, bc[name]["sbase"] + idx, 0)
    return bc["rv"], st, ln, bc["strs"], sidx


def _split_heavy_light(tbl: pa.Table):
    """Split a bucket group into LIGHT pair-gen rows and HEAVY rank-payload
    rows (side < 0), and map each light row to its heavy rank slice.

    Returns (tbl_light, keys, side, starts, lens, rank_values) or None when
    the bucket can't produce pairs.
    """
    import pandas as pd

    side_all = _np(tbl, "side", np.int8)
    heavy_mask = side_all < 0
    if (~heavy_mask).sum() < 2 or heavy_mask.sum() == 0:
        return None
    tbl_h = tbl.filter(pa.array(heavy_mask))
    tbl_l = tbl.filter(pa.array(~heavy_mask))
    rv, ho = _list_col_parts(tbl_h, "ranks")
    h_starts, h_lens = ho[:-1], np.diff(ho)
    h_side = side_all[heavy_mask]
    hkeys_np = tbl_h["key"].to_numpy(zero_copy_only=False)
    keys = tbl_l["key"].combine_chunks() if isinstance(tbl_l["key"], pa.ChunkedArray) else tbl_l["key"]
    lkeys_np = keys.to_numpy(zero_copy_only=False)
    side = _np(tbl_l, "side", np.int8)
    if (h_side == -2).any():
        # two-table join: key spaces may collide across sides — map per side
        hidx = np.full(len(lkeys_np), -1, dtype=np.int64)
        for hs, ls in ((-1, 0), (-2, 1)):
            hsel = np.nonzero(h_side == hs)[0]
            lsel = side == ls
            if len(hsel) and lsel.any():
                pos_in_sub = pd.Index(hkeys_np[hsel]).get_indexer(lkeys_np[lsel])
                hidx[lsel] = np.where(pos_in_sub >= 0, hsel[pos_in_sub], -1)
    else:
        hidx = pd.Index(hkeys_np).get_indexer(lkeys_np)
    if (hidx < 0).any():  # heavy row missing (shouldn't happen) — bail safe
        ok = hidx >= 0
        tbl_l = tbl_l.filter(pa.array(ok))
        keys = tbl_l["key"].combine_chunks() if isinstance(tbl_l["key"], pa.ChunkedArray) else tbl_l["key"]
        side = _np(tbl_l, "side", np.int8)
        hidx = hidx[ok]
    return tbl_l, keys, side, h_starts[hidx], h_lens[hidx], rv


_MATRIX_GROUP_MIN = 8     # below this, per-pair intersect beats matmul setup
# Pair chunking is 1-D (l-rows only): an A/B sweep at 32 CPUs measured 2-D
# L2-sized tiles (512x1024) ~30% SLOWER end-to-end than full-width chunks —
# BLAS blocks the GEMM internally, and small tiles just add per-tile numpy
# call overhead and shrink GEMM efficiency. 512 rows beat 1024 (t_32 36.6s
# vs 41.0s, best-of-2, same input).
import os as _os

_PAIR_CHUNK_ROWS = int(_os.environ.get("RAYSSJ_PAIR_ROWS", "512"))
_PAIR_CHUNK_COLS = int(_os.environ.get("RAYSSJ_PAIR_COLS", str(1 << 30)))
_MATMUL_DENSITY = 0.05    # survivor density above which full-matmul overlap wins

_OT_LUT_CACHE: dict = {}

# Driver-side switch for the bit-packed C fast path (rayssj/native.py):
# captured into each kernel closure at build time so tests can monkeypatch it
# per-join; each worker still independently requires _nat.available().
NATIVE_ENABLED = _os.environ.get("RAYSSJ_NATIVE", "1") != "0"

# Measured dead end (do not retry): preallocated per-worker tile scratch
# written with out= (GEMM outputs + the ot/bound/mask chain). A synthetic
# probe suggested allocation churn hurt 8->32-process scaling (prealloc-out
# GEMM 0.88 vs 0.78 allocating), but the REAL kernel measured the opposite
# like-for-like at 32-way concurrency: 160s allocating vs 276s buffered
# (163s with the power-of-two row stride padded) mean per process on the
# same captured group. numpy's fresh >=4MB mmaps get MADV_HUGEPAGE and
# exact (non-pow2) strides, which beats buffer reuse on this box.


_OT_LUT16_CACHE: dict = {}


def _ot_lut16(sim_measure_type, threshold, max_dom: int):
    """int16 overlap-threshold LUT over the sum domain (JACCARD/DICE, only
    when max_dom fits int16): halves the per-tile ot/dom bytes — the mask
    chain's DRAM traffic is what inflates under 32-way concurrency."""
    key = (sim_measure_type, float(threshold))
    lut = _OT_LUT16_CACHE.get(key)
    if lut is None or len(lut) <= max_dom:
        s = np.arange(max(max_dom + 1, 1024), dtype=np.int64)
        lut = get_overlap_threshold(s, np.zeros_like(s), sim_measure_type,
                                    threshold).astype(np.int16)
        _OT_LUT16_CACHE[key] = lut
    return lut


def _lut_1d(sim_measure_type, threshold, max_dom):
    """int32 1-D overlap-threshold LUT over the measure's scalar domain
    (sum of sizes for JACCARD/DICE, product for COSINE, min for OC) — exact
    ``get_overlap_threshold`` values, shared by the numpy tile path and the
    native fused kernel so both verify against identical thresholds."""
    if sim_measure_type in ("JACCARD", "DICE"):
        probe = lambda s: (s, np.zeros_like(s))
    elif sim_measure_type == "OVERLAP_COEFFICIENT":
        probe = lambda s: (s, s)
    else:  # COSINE
        probe = lambda s: (s, np.ones_like(s))
    key = (sim_measure_type, float(threshold))
    lut = _OT_LUT_CACHE.get(key)
    if lut is None or len(lut) <= max_dom:
        s = np.arange(max(max_dom + 1, 1024), dtype=np.int64)
        a, b = probe(s)
        lut = get_overlap_threshold(a, b, sim_measure_type, threshold).astype(np.int32)
        _OT_LUT_CACHE[key] = lut
    return lut


def _ot_lut(sim_measure_type, threshold, n1, n2):
    """Overlap-threshold matrix via an int32 lookup table over the measure's
    1-D domain (sum / product / min of sizes) — the exact §2.3 formula values
    without per-cell float64 ceil work."""
    if sim_measure_type == "OVERLAP":
        return max(int(threshold), 1)
    if sim_measure_type in ("JACCARD", "DICE"):
        dom = n1 + n2
    elif sim_measure_type == "OVERLAP_COEFFICIENT":
        dom = np.minimum(n1, n2)
    else:  # COSINE: domain is the size product
        dom = n1.astype(np.int64) * n2
        if int(dom.max()) > 8_000_000:
            return get_overlap_threshold(n1, n2, sim_measure_type, threshold)
    return _lut_1d(sim_measure_type, threshold, int(dom.max()))[dom]


def _gather_flat(rv, starts, lens, mem, limit=None):
    """Flat (values, row-ids) of members' rank arrays; row ``i``'s array is
    ``rv[starts[i] : starts[i]+lens[i]]``; ``limit`` caps each member to its
    first ``limit[member]`` elements (prefix gather)."""
    lengths = lens[mem].astype(np.int64)
    if limit is not None:
        lengths = np.minimum(lengths, limit[mem])
    total = int(lengths.sum())
    first = np.concatenate(([0], np.cumsum(lengths[:-1])))
    flat_idx = np.repeat(starts[mem], lengths) + (
        np.arange(total, dtype=np.int64) - np.repeat(first, lengths))
    rows = np.repeat(np.arange(len(mem), dtype=np.int64), lengths)
    return rv[flat_idx], rows


def _membership(vals, rows, n_mem, vocab=None):
    """(vocab, M): M[i, v] = 1 iff vocab[v] among member i's values; float32
    so pairwise overlap is one BLAS matmul."""
    if vocab is None:
        # NOTE: unique + searchsorted measured FASTER than
        # unique(return_inverse=True) (inverse pays an argsort)
        vocab = np.unique(vals)
    col = np.searchsorted(vocab, vals)
    M = np.zeros((n_mem, len(vocab)), dtype=np.float32)
    M[rows, col] = 1.0
    return vocab, M


def _packed_membership(vals, rows, n_mem, vocab):
    """Bit-packed membership over ``vocab`` for the native fused kernel:
    row ``i`` holds one bit per vocab entry present in member ``i``, packed
    into ``ceil(|vocab|/64)`` uint64 words.

    The two build paths use DIFFERENT bit orderings (packbits is per-byte
    big-endian; the scatter path is per-word little-endian) — safe because
    both operands of any AND test are always slices of the SAME matrix built
    by one call, and the tests are order-insensitive given a consistent
    token<->bit bijection.
    """
    ncols = len(vocab)
    if ncols == 0:
        return np.zeros((n_mem, 0), dtype=np.uint64)
    col = np.searchsorted(vocab, vals)
    if n_mem * ncols <= (64 << 20):
        dense = np.zeros((n_mem, ncols), dtype=np.uint8)
        dense[rows, col] = 1
        return _nat.pack_bits(dense)
    # huge cells: skip the dense intermediate; or.at scatter is slower per
    # element but memory stays at the packed size
    out = np.zeros((n_mem, (ncols + 63) // 64), dtype=np.uint64)
    np.bitwise_or.at(out, (rows, col >> 6),
                     np.uint64(1) << (col & 63).astype(np.uint64))
    return out


def _member_matrices(rv, starts, lens, mem, pl, build_prefix=True):
    """Local-vocab membership matrices for group members ``mem``.

    Returns (vocab, M, P): M over full token sets, P restricted to prefixes.
    """
    vals, rows = _gather_flat(rv, starts, lens, mem)
    vocab, M = _membership(vals, rows, len(mem))
    P = None
    if build_prefix:
        pvals, prows = _gather_flat(rv, starts, lens, mem, limit=pl)
        _, P = _membership(pvals, prows, len(mem), vocab=vocab)
    return vocab, M, P


def make_set_sim_bucket_kernel(sim_measure_type: str, threshold: float,
                               comp_op: str, self_join: bool,
                               ranks_ref=None):
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
    comp_op_is_ge = comp_op == ">="
    allow_native = NATIVE_ENABLED  # driver-time capture (see NATIVE_ENABLED)

    def kernel(tbl: pa.Table) -> pa.Table:
        all_keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
        key_type = all_keys.type
        empty = pa.table({"l_key": pa.array([], type=key_type),
                          "r_key": pa.array([], type=key_type),
                          "_sim_score": pa.array([], type=pa.float64())})
        if tbl.num_rows < 2:
            return empty
        parts = (_resolve_ranks_broadcast(tbl, ranks_ref)
                 if ranks_ref is not None else _split_heavy_light(tbl))
        if parts is None:
            return empty
        tbl_l, keys, side, st, ln, rv = parts
        if len(tbl_l) < 2:
            return empty

        ptok = _np(tbl_l, "ptok")
        size = _np(tbl_l, "size")
        pl = _np(tbl_l, "pl")
        pos = _np(tbl_l, "pos")
        grp = _np(tbl_l, "grp")
        # the native integer path relies on o >= ot <=> sim >= t, which is
        # exact only for the ">=" comparator (same precondition as the numpy
        # integer fast path below)
        use_native = (allow_native and comp_op_is_ge and not is_oc
                      and _nat.available())

        out_l, out_r, out_s = [], [], []

        def emit(li, ri, sim):
            out_l.append(np.asarray(li))
            out_r.append(np.asarray(ri))
            out_s.append(np.asarray(sim, dtype=np.float64))

        def _small_group(gl, gr, w, triu):
            if triu:
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
            first, overlap = _first_shared_prefix(rv, st, ln, li, ri, pl_l, pl_r)
            keep = first == w
            li, ri, overlap = li[keep], ri[keep], overlap[keep]
            if len(li) == 0:
                return
            sim = compute_sim(sim_measure_type, overlap, size[li], size[ri])
            keep = comp_fn(sim, threshold)
            if keep.any():
                emit(li[keep], ri[keep], sim[keep])

        def _pairs_overlap(li, ri):
            """Per-pair exact overlap on sorted rank slices (sparse survivors).

            NOTE: the per-pair ``intersect1d`` loop measured FASTER than both a
            flat lexsort-and-count formulation (~10x) and a per-pair
            searchsorted probe (~1.5x) at the survivor sizes this path sees
            (<6000 pairs/tile, slices of a few hundred ranks)."""
            ov = np.empty(len(li), dtype=np.int64)
            for k in range(len(li)):
                a = rv[st[li[k]]:st[li[k]] + ln[li[k]]]
                b = rv[st[ri[k]]:st[ri[k]] + ln[ri[k]]]
                ov[k] = len(np.intersect1d(a, b, assume_unique=True))
            return ov

        def _big_group_oc(g, l_loc, r_loc, w, triu):
            vocab, M, P = _member_matrices(rv, st, ln, g, pl)
            w_idx = int(np.searchsorted(vocab, w))
            gl, gr = g[l_loc], g[r_loc]
            sz_l_all, sz_r = size[gl], size[gr]
            pos_l_all, pos_r = pos[gl], pos[gr]
            nr = len(gr)
            for i0 in range(0, len(gl), _PAIR_CHUNK_ROWS):
                i1 = min(i0 + _PAIR_CHUNK_ROWS, len(gl))
                # triu cells: slice off columns j <= i0 (see _big_group)
                j0 = i0 + 1 if triu else 0
                if j0 >= nr:
                    continue
                lc = l_loc[i0:i1]
                n1 = sz_l_all[i0:i1][:, None]
                w_in_pref_l = (P[lc, w_idx] > 0)[:, None]
                rc = r_loc[j0:]
                F = M[lc] @ M[rc].T  # exact pairwise overlap counts
                n2 = sz_r[j0:][None, :]
                ot = get_overlap_threshold(n1, n2, sim_measure_type, threshold)
                mask = np.minimum(n1, n2) >= ot
                ub = 1 + np.minimum(n1 - pos_l_all[i0:i1][:, None] - 1,
                                    n2 - pos_r[j0:][None, :] - 1)
                mask &= ub >= ot
                if triu and j0 < min(i1, nr):
                    jb = min(i1, nr)
                    mask[:, :jb - j0] &= (np.arange(i0, i1)[:, None] <
                                          np.arange(j0, jb)[None, :])
                # prefix(small) x full(large): two asymmetric matmuls
                S_pf = P[lc, :w_idx] @ M[rc, :w_idx].T   # l-prefix · r-full
                S_fp = M[lc, :w_idx] @ P[rc, :w_idx].T   # l-full · r-prefix
                l_small = n1 <= n2
                before = np.where(l_small, S_pf, S_fp)
                mask &= before == 0
                # w itself must lie in the smaller side's true prefix
                w_in_pref_r = (P[rc, w_idx] > 0)[None, :]
                mask &= np.where(l_small, w_in_pref_l, w_in_pref_r)
                sim = compute_sim(sim_measure_type, F, n1, n2)
                mask &= comp_fn(sim, threshold)
                ii, jj = np.nonzero(mask)
                if len(ii):
                    emit(gl[i0:i1][ii], gr[j0:][jj], sim[ii, jj])

        def _big_group_native(g, l_loc, r_loc, w, triu):
            """Fused bit-packed verification (rayssj/native.py): one C pass
            per tile does feasibility + triangular rule + prefix-dedup AND-any
            + overlap AND-popcount and emits survivors compactly. Replaces the
            two float32 GEMMs and every per-tile numpy temporary — operands
            are 64x smaller and L2-resident, which is what restores 8->32
            process scaling (BASELINE.md round-4 matrix). Returns False to
            decline (caller falls back to the numpy path)."""
            if sim_measure_type == "OVERLAP":
                mode, lut = 1, np.array([max(int(threshold), 1)], np.int32)
            elif sim_measure_type in ("JACCARD", "DICE"):
                mode = 0
                lut = _lut_1d(sim_measure_type, threshold,
                              2 * int(size[g].max()))
            else:  # COSINE: product domain; decline when the LUT would blow up
                mode = 2
                max_dom = int(size[g].max()) ** 2
                if max_dom > 8_000_000:
                    return False
                lut = _lut_1d(sim_measure_type, threshold, max_dom)
            if triu:
                perm = np.argsort(size[g], kind="stable")
                l_loc = r_loc = l_loc[perm]
            else:
                l_loc = l_loc[np.argsort(size[g[l_loc]], kind="stable")]
                r_loc = r_loc[np.argsort(size[g[r_loc]], kind="stable")]
            gl, gr = g[l_loc], g[r_loc]
            # packed prefix membership restricted to tokens ranked below w
            # (the emit-at-first-shared-prefix dedup test)
            pvals, prows = _gather_flat(rv, st, ln, g, limit=pl)
            below = pvals < w
            pvocab = np.unique(pvals[below])
            PPk = _packed_membership(pvals[below], prows[below], len(g), pvocab)
            # packed full token sets (exact overlap counts)
            fvals, frows = _gather_flat(rv, st, ln, g)
            MPk = _packed_membership(fvals, frows, len(g), np.unique(fvals))
            AP, BP = PPk[l_loc], PPk[r_loc]
            AF, BF = MPk[l_loc], MPk[r_loc]
            n1v = size[gl].astype(np.int32)
            n2v = size[gr].astype(np.int32)
            b1v = (size[gl] - pos[gl]).astype(np.int32)
            b2v = (size[gr] - pos[gr]).astype(np.int32)
            for i0 in range(0, len(gl), _PAIR_CHUNK_ROWS):
                i1 = min(i0 + _PAIR_CHUNK_ROWS, len(gl))
                jstart = i0 + 1 if triu else 0
                jstart = max(jstart, int(np.searchsorted(
                    n2v, get_size_lower_bound(int(n1v[i0]),
                                              sim_measure_type, threshold),
                    side="left")))
                jend = int(np.searchsorted(
                    n2v, get_size_upper_bound(int(n1v[i1 - 1]),
                                              sim_measure_type, threshold),
                    side="right"))
                if jstart >= jend:
                    continue
                ii, jj, cc = _nat.verify_emit(
                    AP[i0:i1], BP[jstart:jend], AF[i0:i1], BF[jstart:jend],
                    n1v[i0:i1], n2v[jstart:jend],
                    b1v[i0:i1], b2v[jstart:jend],
                    lut, mode, 0, 0, 0, triu, i0, jstart)
                if len(ii):
                    li = gl[i0 + ii.astype(np.int64)]
                    ri = gr[jstart + jj.astype(np.int64)]
                    sim = compute_sim(sim_measure_type, cc.astype(np.float64),
                                      size[li], size[ri])
                    emit(li, ri, sim)
            return True

        def _big_group(g, l_loc, r_loc, w, triu):
            if is_oc:
                _big_group_oc(g, l_loc, r_loc, w, triu)
                return
            if use_native and _big_group_native(g, l_loc, r_loc, w, triu):
                return
            # standard measures: cheap size/positional masks + PREFIX-only
            # membership matrices for the dedup test; the expensive full-vocab
            # overlap matmul is built lazily, and sparse survivor sets fall
            # back to per-pair sorted intersects.
            # order both sides by token-set size: each 512-row l-chunk then
            # has a CONTIGUOUS feasible r-window (the §2.3 size bound), and
            # columns outside it are sliced off before any tile work. For
            # triu cells one shared permutation keeps i<j a valid
            # enumerate-each-unordered-pair-once rule.
            if triu:
                perm = np.argsort(size[g], kind="stable")
                l_loc = r_loc = l_loc[perm]
            else:
                l_loc = l_loc[np.argsort(size[g[l_loc]], kind="stable")]
                r_loc = r_loc[np.argsort(size[g[r_loc]], kind="stable")]
            gl, gr = g[l_loc], g[r_loc]
            pvals, prows = _gather_flat(rv, st, ln, g, limit=pl)
            pvocab, P = _membership(pvals, prows, len(g))
            w_idx = int(np.searchsorted(pvocab, w))
            Pb = P[:, :w_idx]
            state = {"M": None}
            sz_l_all = size[gl].astype(np.int32)
            sz_r = size[gr].astype(np.int32)
            # fused feasibility: min(n1,n2) >= ot AND min(rem1,rem2)+1 >= ot
            # collapses to min(n1-pos1, n2-pos2) >= ot (pos >= 0 makes
            # n-pos <= n) — ONE broadcast min of two 1-D bounds per tile
            # instead of a min-size tile plus a remaining-position tile
            bnd_l = (sz_l_all - pos[gl]).astype(np.int32)
            bnd_r = (sz_r - pos[gr]).astype(np.int32)
            # narrow int16 tile mode: sum-domain LUT measures with sizes
            # small enough that n1+n2 fits int16 (any sane token corpus) run
            # the dom/ot/bound tiles at 2 bytes/cell instead of 4
            lut16 = None
            if sim_measure_type in ("JACCARD", "DICE"):
                max_dom = int(sz_l_all.max()) + int(sz_r.max())
                if max_dom < 32760:
                    lut16 = _ot_lut16(sim_measure_type, threshold, max_dom)
                    sz_l_all = sz_l_all.astype(np.int16)
                    sz_r = sz_r.astype(np.int16)
                    bnd_l = bnd_l.astype(np.int16)
                    bnd_r = bnd_r.astype(np.int16)
            # gather the r-side operand ONCE per cell; tiles slice rows off
            # it (a view), instead of re-gathering per tile
            PbR = Pb[r_loc]
            for i0 in range(0, len(gl), _PAIR_CHUNK_ROWS):
                i1 = min(i0 + _PAIR_CHUNK_ROWS, len(gl))
                # triu cells (self-join): columns j <= i0 can never satisfy
                # i < j for rows >= i0 — slice them off the tile entirely,
                # halving total mask + GEMM area over the whole cell
                jstart = i0 + 1 if triu else 0
                # feasible size window for this (sorted) l-chunk: columns
                # whose sizes fall outside [lb(min n1), ub(max n1)] cannot
                # pass min(n1,n2) >= ot — skip them before any tile work
                jstart = max(jstart, int(np.searchsorted(
                    sz_r, get_size_lower_bound(int(sz_l_all[i0]),
                                               sim_measure_type, threshold),
                    side="left")))
                jend = int(np.searchsorted(
                    sz_r, get_size_upper_bound(int(sz_l_all[i1 - 1]),
                                               sim_measure_type, threshold),
                    side="right"))
                if jstart >= jend:
                    continue
                lc = l_loc[i0:i1]
                Pl = Pb[lc]
                n1c = sz_l_all[i0:i1][:, None]
                bl_c = bnd_l[i0:i1][:, None]
                Ml = None
                for j0 in range(jstart, jend, _PAIR_CHUNK_COLS):
                    j1 = min(j0 + _PAIR_CHUNK_COLS, jend)
                    n1 = n1c
                    n2 = sz_r[j0:j1][None, :]
                    # integer mask chain + overlap-threshold LUT: avoid
                    # float64 ceil per cell (int16 tiles when sizes allow)
                    if lut16 is not None:
                        ot = lut16[n1 + n2]
                    else:
                        ot = _ot_lut(sim_measure_type, threshold, n1, n2)
                    mask = np.minimum(bl_c, bnd_r[j0:j1][None, :]) >= ot
                    if triu and j0 < min(i1, j1):
                        # only the in-band columns [j0, i1) need the
                        # triangular test; every column >= i1 has i < j
                        jb = min(i1, j1)
                        mask[:, :jb - j0] &= (np.arange(i0, i1)[:, None] <
                                              np.arange(j0, jb)[None, :])
                    if not mask.any():
                        continue
                    before = Pl @ PbR[j0:j1].T
                    mask &= before == 0
                    n_surv = int(np.count_nonzero(mask))
                    if n_surv == 0:
                        continue
                    # per-pair intersects win only for sparse survivors
                    if n_surv >= min(6000, _MATMUL_DENSITY * mask.size):
                        if state["M"] is None:
                            vals, rows_ = _gather_flat(rv, st, ln, g)
                            _, M_full = _membership(vals, rows_, len(g))
                            state["M"] = M_full
                            state["MR"] = M_full[r_loc]
                        if Ml is None:
                            Ml = state["M"][lc]
                        F = Ml @ state["MR"][j0:j1].T
                        if comp_op_is_ge:
                            # integer threshold test (o >= ot <=> sim >= t,
                            # verified exact over the whole boundary domain);
                            # float sims only for EMITTED pairs — skips two
                            # full-tile float64 temporaries per tile
                            mask &= F >= ot
                            ii, jj = np.nonzero(mask)
                            if len(ii):
                                o = F[ii, jj].astype(np.float64)
                                sim1 = compute_sim(sim_measure_type, o,
                                                   n1[ii, 0], n2[0, jj])
                                emit(gl[i0:i1][ii], gr[j0:j1][jj], sim1)
                        else:
                            sim = compute_sim(sim_measure_type, F, n1, n2)
                            mask &= comp_fn(sim, threshold)
                            ii, jj = np.nonzero(mask)
                            if len(ii):
                                emit(gl[i0:i1][ii], gr[j0:j1][jj], sim[ii, jj])
                    else:
                        ii, jj = np.nonzero(mask)
                        li, ri = gl[i0:i1][ii], gr[j0:j1][jj]
                        ov = _pairs_overlap(li, ri)
                        sim = compute_sim(sim_measure_type, ov, size[li], size[ri])
                        keep = comp_fn(sim, threshold)
                        if keep.any():
                            emit(li[keep], ri[keep], sim[keep])

        for g, l_loc, r_loc, triu in _iter_cells(grp, side, self_join):
            w = ptok[g[0]]
            if len(g) < _MATRIX_GROUP_MIN:
                _small_group(g[l_loc], g[r_loc], w, triu)
            else:
                _big_group(g, l_loc, r_loc, w, triu)

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
                                     self_join: bool, qval: int = 2,
                                     ranks_ref=None):
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
    allow_native = NATIVE_ENABLED  # driver-time capture (see NATIVE_ENABLED)

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
        pv_st, pv_ln = po[:-1], np.diff(po)
        if ranks_ref is not None:
            gv, gv_st, gv_ln, strs_all, sidx = _resolve_ed_broadcast(tbl, ranks_ref)
            strs = strs_all.take(pa.array(sidx, type=pa.int64()))
            go = None
        else:
            gv, go = _list_col_parts(tbl, "grams")    # full distinct sets
            gv_st, gv_ln = go[:-1], np.diff(go)
            strs = tbl["s"].combine_chunks() if isinstance(tbl["s"], pa.ChunkedArray) else tbl["s"]

        grp = _np(tbl, "grp")
        cand_l, cand_r = [], []
        # candidate-generation bounds are comp_op-independent (the Levenshtein
        # verify below applies comp_fn), so native needs no comparator gate
        use_native = allow_native and _nat.available()

        def _small(gl, gr, w, triu):
            if triu:
                n = len(gl)
                iu, ju = np.triu_indices(n, k=1)
                li, ri = gl[iu], gl[ju]
            else:
                li = np.repeat(gl, len(gr))
                ri = np.tile(gr, len(gl))
            m = np.abs(slen[li] - slen[ri]) <= t
            li, ri = li[m], ri[m]
            for k in range(len(li)):
                a, b = li[k], ri[k]
                shared_pref = np.intersect1d(pv[po[a]:po[a + 1]], pv[po[b]:po[b + 1]],
                                             assume_unique=True)
                if len(shared_pref) == 0 or shared_pref[0] != w:
                    continue
                ov = len(np.intersect1d(gv[gv_st[a]:gv_st[a] + gv_ln[a]],
                                        gv[gv_st[b]:gv_st[b] + gv_ln[b]],
                                        assume_unique=True))
                if ov < max(dsize[a], dsize[b]) - qt:
                    continue
                cand_l.append(np.array([a]))
                cand_r.append(np.array([b]))

        def _big_native(g, l_loc, r_loc, w, triu):
            """Fused bit-packed candidate generation (see _big_group_native):
            length filter + triangular rule + prefix-dedup AND-any + q-gram
            count bound (mode 3: shared >= max(d1,d2) - q*t) in one C pass."""
            if triu:
                perm = np.argsort(slen[g], kind="stable")
                l_loc = r_loc = l_loc[perm]
            else:
                l_loc = l_loc[np.argsort(slen[g[l_loc]], kind="stable")]
                r_loc = r_loc[np.argsort(slen[g[r_loc]], kind="stable")]
            gl, gr = g[l_loc], g[r_loc]
            pvals, prows = _gather_flat(pv, pv_st, pv_ln, g)
            below = pvals < w
            PPk = _packed_membership(pvals[below], prows[below], len(g),
                                     np.unique(pvals[below]))
            gvals, grows = _gather_flat(gv, gv_st, gv_ln, g)
            MPk = _packed_membership(gvals, grows, len(g), np.unique(gvals))
            AP, BP = PPk[l_loc], PPk[r_loc]
            AF, BF = MPk[l_loc], MPk[r_loc]
            n1v = dsize[gl].astype(np.int32)
            n2v = dsize[gr].astype(np.int32)
            b1v = slen[gl].astype(np.int32)
            b2v = slen[gr].astype(np.int32)
            c1 = int(np.floor(t))  # |L1-L2| <= t over ints
            slr = slen[gr]
            for i0 in range(0, len(gl), _PAIR_CHUNK_ROWS):
                i1 = min(i0 + _PAIR_CHUNK_ROWS, len(gl))
                j0 = i0 + 1 if triu else 0
                j0 = max(j0, int(np.searchsorted(
                    slr, slen[gl[i0]] - max_d, side="left")))
                jend = int(np.searchsorted(
                    slr, slen[gl[i1 - 1]] + max_d, side="right"))
                if j0 >= jend:
                    continue
                ii, jj, _cc = _nat.verify_emit(
                    AP[i0:i1], BP[j0:jend], AF[i0:i1], BF[j0:jend],
                    n1v[i0:i1], n2v[j0:jend], b1v[i0:i1], b2v[j0:jend],
                    None, 3, qt, 1, c1, triu, i0, j0)
                if len(ii):
                    cand_l.append(gl[i0 + ii.astype(np.int64)])
                    cand_r.append(gr[j0 + jj.astype(np.int64)])

        def _big(g, l_loc, r_loc, w, triu):
            if use_native:
                _big_native(g, l_loc, r_loc, w, triu)
                return
            # order by string length: each l-chunk's feasible r-columns
            # (|L1-L2| <= t) form a contiguous window (see _big_group)
            if triu:
                perm = np.argsort(slen[g], kind="stable")
                l_loc = r_loc = l_loc[perm]
            else:
                l_loc = l_loc[np.argsort(slen[g[l_loc]], kind="stable")]
                r_loc = r_loc[np.argsort(slen[g[r_loc]], kind="stable")]
            # membership matrices over local prefix / full-gram vocabularies
            pvocab, P, _ = _member_matrices(pv, pv_st, pv_ln, g, None, build_prefix=False)
            gvocab, M, _ = _member_matrices(gv, gv_st, gv_ln, g, None, build_prefix=False)
            w_idx = int(np.searchsorted(pvocab, w))
            gl, gr = g[l_loc], g[r_loc]
            Pb = P[:, :w_idx]
            slr = slen[gr]
            for i0 in range(0, len(gl), _PAIR_CHUNK_ROWS):
                i1 = min(i0 + _PAIR_CHUNK_ROWS, len(gl))
                # triu cells: slice off columns j <= i0 (see _big_group)
                j0 = i0 + 1 if triu else 0
                j0 = max(j0, int(np.searchsorted(
                    slr, slen[gl[i0]] - max_d, side="left")))
                jend = int(np.searchsorted(
                    slr, slen[gl[i1 - 1]] + max_d, side="right"))
                if j0 >= jend:
                    continue
                lc = l_loc[i0:i1]
                L1 = slen[gl[i0:i1]][:, None]
                d1 = dsize[gl[i0:i1]][:, None]
                rc = r_loc[j0:jend]
                L2 = slr[j0:jend][None, :]
                mask = np.abs(L1 - L2) <= t
                if triu and j0 < min(i1, jend):
                    jb = min(i1, jend)
                    mask[:, :jb - j0] &= (np.arange(i0, i1)[:, None] <
                                          np.arange(j0, jb)[None, :])
                if not mask.any():
                    continue
                before = Pb[lc] @ Pb[rc].T
                mask &= before == 0
                if not mask.any():
                    continue
                F = M[lc] @ M[rc].T
                d2 = dsize[gr[j0:jend]][None, :]
                mask &= F >= np.maximum(d1, d2) - qt
                ii, jj = np.nonzero(mask)
                if len(ii):
                    cand_l.append(gl[i0:i1][ii])
                    cand_r.append(gr[j0:jend][jj])

        for g, l_loc, r_loc, triu in _iter_cells(grp, side, self_join):
            w = ptok[g[0]]
            if len(g) < _MATRIX_GROUP_MIN:
                _small(g[l_loc], g[r_loc], w, triu)
            else:
                _big(g, l_loc, r_loc, w, triu)

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
                              threshold: float, self_join: bool,
                              ranks_ref=None):
    """Bucket kernel for PrefixFilter / PositionFilter ``filter_tables``
    (SURVEY.md §2 #10, #11): emits candidate pairs WITHOUT verification.

    filter_type="prefix": any shared prefix token (emit-at-first-shared dedup).
    filter_type="position": additionally require the PPJoin positional bound —
    (# shared prefix tokens) + min tokens remaining after the LAST shared
    prefix position >= overlap threshold [ref: filter/position_filter.py:~80 †U].
    """
    allow_native = NATIVE_ENABLED  # driver-time capture (see NATIVE_ENABLED)

    def kernel(tbl: pa.Table) -> pa.Table:
        keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
        key_type = keys.type
        empty = pa.table({"l_key": pa.array([], type=key_type),
                          "r_key": pa.array([], type=key_type)})
        if tbl.num_rows < 2:
            return empty
        parts = (_resolve_ranks_broadcast(tbl, ranks_ref)
                 if ranks_ref is not None else _split_heavy_light(tbl))
        if parts is None:
            return empty
        tbl_l, keys, side, st, ln, rv = parts
        if len(tbl_l) < 2:
            return empty
        ptok = _np(tbl_l, "ptok")
        size = _np(tbl_l, "size")
        pl = _np(tbl_l, "pl")
        grp = _np(tbl_l, "grp")
        out_l, out_r = [], []

        def _position_bound(li, ri):
            """Survivors-only positional check: per emitted candidate (not per
            cell pair), gather the last shared prefix token's positions."""
            ot = get_overlap_threshold(size[li], size[ri], sim_measure_type,
                                       threshold)
            keep = np.zeros(len(li), dtype=bool)
            for k in range(len(li)):
                a = rv[st[li[k]]:st[li[k]] + ln[li[k]]]
                b = rv[st[ri[k]]:st[ri[k]] + ln[ri[k]]]
                shared = np.intersect1d(a[:pl[li[k]]], b[:pl[ri[k]]],
                                        assume_unique=True)
                last = shared[-1]
                pos_l = int(np.searchsorted(a, last))
                pos_r = int(np.searchsorted(b, last))
                bound = len(shared) + min(size[li[k]] - pos_l - 1,
                                          size[ri[k]] - pos_r - 1)
                keep[k] = bound >= ot[k]
            return keep

        def _small(gl, gr, w, triu):
            if triu:
                iu, ju = np.triu_indices(len(gl), k=1)
                li, ri = gl[iu], gl[ju]
            else:
                li = np.repeat(gl, len(gr))
                ri = np.tile(gr, len(gl))
            keep = np.zeros(len(li), dtype=bool)
            for k in range(len(li)):
                a = rv[st[li[k]]:st[li[k]] + ln[li[k]]]
                b = rv[st[ri[k]]:st[ri[k]] + ln[ri[k]]]
                shared = np.intersect1d(a[:pl[li[k]]], b[:pl[ri[k]]],
                                        assume_unique=True)
                keep[k] = len(shared) > 0 and shared[0] == w
            li, ri = li[keep], ri[keep]
            if len(li) == 0:
                return
            if filter_type == "position":
                pk = _position_bound(li, ri)
                li, ri = li[pk], ri[pk]
            if len(li):
                out_l.append(li)
                out_r.append(ri)

        def _big(g, l_loc, r_loc, w, triu):
            # membership dedup (same machinery as the join kernels, replacing
            # the round-1 per-cell-pair Python loop): every member has w in
            # its prefix by construction, so first-shared == w is exactly "no
            # shared prefix token ranked before w". Native path: one fused
            # AND-any C pass per tile (see _big_group_native).
            gl, gr = g[l_loc], g[r_loc]
            nr = len(gr)
            pvals, prows = _gather_flat(rv, st, ln, g, limit=pl)
            use_native = allow_native and _nat.available()
            if use_native:
                below = pvals < w
                PPk = _packed_membership(pvals[below], prows[below], len(g),
                                         np.unique(pvals[below]))
                AP, BP = PPk[l_loc], PPk[r_loc]
                szl = size[gl].astype(np.int32)
                szr = size[gr].astype(np.int32)
            else:
                pvocab, P = _membership(pvals, prows, len(g))
                w_idx = int(np.searchsorted(pvocab, w))
                Pb = P[:, :w_idx]
            for i0 in range(0, len(gl), _PAIR_CHUNK_ROWS):
                i1 = min(i0 + _PAIR_CHUNK_ROWS, len(gl))
                # triu cells: slice off columns j <= i0 (see _big_group)
                j0 = i0 + 1 if triu else 0
                if j0 >= nr:
                    continue
                if use_native:
                    ii, jj, _cc = _nat.verify_emit(
                        AP[i0:i1], BP[j0:], None, None,
                        szl[i0:i1], szr[j0:], szl[i0:i1], szr[j0:],
                        None, 1, 0, 2, 0, triu, i0, j0)
                    if len(ii) == 0:
                        continue
                    li = gl[i0 + ii.astype(np.int64)]
                    ri = gr[j0 + jj.astype(np.int64)]
                else:
                    lc = l_loc[i0:i1]
                    rc = r_loc[j0:]
                    mask = Pb[lc] @ Pb[rc].T == 0
                    if triu and j0 < min(i1, nr):
                        jb = min(i1, nr)
                        mask[:, :jb - j0] &= (np.arange(i0, i1)[:, None] <
                                              np.arange(j0, jb)[None, :])
                    ii, jj = np.nonzero(mask)
                    if len(ii) == 0:
                        continue
                    li, ri = gl[i0:i1][ii], gr[j0:][jj]
                if filter_type == "position":
                    pk = _position_bound(li, ri)
                    li, ri = li[pk], ri[pk]
                if len(li):
                    out_l.append(li)
                    out_r.append(ri)

        for g, l_loc, r_loc, triu in _iter_cells(grp, side, self_join):
            w = ptok[g[0]]
            if len(g) < _MATRIX_GROUP_MIN:
                _small(g[l_loc], g[r_loc], w, triu)
            else:
                _big(g, l_loc, r_loc, w, triu)

        if not out_l:
            return empty
        li = np.concatenate(out_l)
        ri = np.concatenate(out_r)
        lk, rk = _emit_keys(keys, li, ri, normalize=self_join)
        return pa.table({"l_key": lk, "r_key": rk})

    return kernel
