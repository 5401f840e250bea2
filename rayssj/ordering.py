"""Global token ordering (SURVEY.md §2 #23).

Reference: ``gen_token_ordering_for_tables`` / ``order_using_token_ordering``
[ref: py_stringsimjoin/utils/token_ordering.py:~15 †U] — rank every token by
ascending global document frequency across BOTH tables, ties broken by token
value; each record's tokens are then reordered by rank so prefixes are the
globally rarest tokens.

Ray-Data design: per-batch partial counts (value_counts inside map_batches —
the combiner) → one small ``groupby(token).sum`` shuffle → driver-side sort by
(count, token) → broadcast rank index via ``ray.put``. The broadcast state is
bounded by VOCABULARY size, not corpus size (SURVEY.md §4 delta 3); at 10^12-doc
scale swap the driver-side sort for a distributed ``ds.sort`` + zip-index and a
sharded rank lookup actor — the stage contract (token → int64 rank) is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from rayssj.tokenizers import _list_parts


TOKENS_COL = "__tokens"


def _partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (token, partial count) plus one marker row carrying
    the batch's empty-token-set and missing (null) row counts — one pass
    computes the ordering AND the allow_empty/allow_missing side-path stats."""
    col = batch[TOKENS_COL]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n_missing = col.null_count
    lens = pc.list_value_length(col)
    n_empty = len(pc.indices_nonzero(pc.and_(pc.is_valid(col), pc.equal(lens, 0))))
    values, _ = _list_parts(batch[TOKENS_COL])
    if len(values) == 0:
        tok = pa.array([None], type=pa.string())
        return pa.table({"token": tok,
                         "cnt": pa.array([0], type=pa.int64()),
                         "n_empty": pa.array([n_empty], type=pa.int64()),
                         "n_missing": pa.array([n_missing], type=pa.int64())})
    vc = values.value_counts()
    k = len(vc)
    return pa.table({
        "token": pa.concat_arrays([vc.field("values").cast(pa.string()),
                                   pa.array([None], type=pa.string())]),
        "cnt": pa.concat_arrays([vc.field("counts").cast(pa.int64()),
                                 pa.array([0], type=pa.int64())]),
        "n_empty": pa.array([0] * k + [n_empty], type=pa.int64()),
        "n_missing": pa.array([0] * k + [n_missing], type=pa.int64()),
    })


def _merge_partials(batch: pa.Table) -> pa.Table:
    """Second-level combiner: merge many per-batch partial tables."""
    import pandas as pd

    df = batch.to_pandas()
    markers = df[df["token"].isna()]
    counts = (df[df["token"].notna()].groupby("token", as_index=False)["cnt"].sum())
    out = pd.DataFrame({"token": list(counts["token"]) + [None],
                        "cnt": list(counts["cnt"]) + [0],
                        "n_empty": [0] * len(counts) + [int(markers["n_empty"].sum())],
                        "n_missing": [0] * len(counts) + [int(markers["n_missing"].sum())]})
    return pa.Table.from_pandas(out, preserve_index=False)\
        .replace_schema_metadata(None)


class TokenOrder:
    """Global token ordering + side-path stats (driver-built variant; good to
    a few million distinct tokens).

    ``index``: pandas Index, position = rank (ascending frequency, ties by
    token). ``counts``: int64 ndarray aligned to rank (document frequency for
    set tokenizers) — drives hot-token salting. ``n_empty``/``n_missing``:
    row counts for the allow_empty / allow_missing side paths (the extra key
    fetch passes run only when these are non-zero).
    """

    __slots__ = ("index", "counts", "n_empty", "n_missing")

    def __init__(self, index, counts, n_empty, n_missing):
        self.index = index
        self.counts = counts
        self.n_empty = int(n_empty)
        self.n_missing = int(n_missing)

    def __len__(self):
        return len(self.index)

    def encode(self, list_arr: pa.ListArray):
        """(flat sorted ranks, aligned token counts, row lengths)."""
        rv, lengths = encode_ranks(list_arr, self.index)
        if len(self.counts) and len(rv):
            cv = self.counts[rv]
        else:
            cv = np.zeros(len(rv), dtype=np.int64)
        return rv, cv, lengths


class HashedTokenOrder:
    """EXACT (count, token)-order ranks behind a sharded uint64-hash lookup —
    the web-scale replacement for the driver-built :class:`TokenOrder`
    (SURVEY.md §4 delta 3; VERDICT r01 'kill the driver-side vocabulary').

    The driver never materializes the vocabulary: counts are aggregated with
    a distributed groupby, ranks are assigned by a distributed
    ``sort(cnt, token)`` + per-block offset zip (the sort's global block order
    IS the rank order), and the lookup lives in the object store as
    ``num_shards`` hash-range shards of (token_hash u64 sorted, rank i64,
    count i64). Workers fetch shards zero-copy (plasma mmap — shared per
    node, not copied per worker) and cache them per instance.

    Ranks are bit-identical to the TokenOrder ranks, so every oracle-checked
    ordering semantic (prefix/position filters, join candidates) is
    unchanged. A 64-bit hash collision between two distinct tokens would
    alias their ranks; the build detects duplicates per shard and raises
    (probability ~(V^2)/2^65 — ~3e-6 at 10M tokens); fall back to
    ``mode="driver"`` in that event.
    """

    def __init__(self, shard_refs, num_shards, n_empty, n_missing, size):
        self.shard_refs = list(shard_refs)
        self.num_shards = int(num_shards)
        self.n_empty = int(n_empty)
        self.n_missing = int(n_missing)
        self.size = int(size)
        self._cache: dict = {}

    def __len__(self):
        return self.size

    def __reduce__(self):
        return (HashedTokenOrder, (self.shard_refs, self.num_shards,
                                   self.n_empty, self.n_missing, self.size))

    def _shard(self, s: int):
        if s not in self._cache:
            self._cache[s] = ray.get(self.shard_refs[s])
        return self._cache[s]

    def encode(self, list_arr: pa.ListArray):
        from rayssj.checkpoint import stable_hash64

        values, lengths = _list_parts(list_arr)
        if len(values) == 0:
            z = np.array([], dtype=np.int64)
            return z, z.copy(), lengths
        h = (stable_hash64(values.cast(pa.string()))
             .to_numpy(zero_copy_only=False).view(np.uint64))
        ranks = np.full(len(h), -1, dtype=np.int64)
        cnts = np.zeros(len(h), dtype=np.int64)
        q = np.uint64(2**64 // self.num_shards)
        sid = np.minimum(h // q, np.uint64(self.num_shards - 1)).astype(np.int64)
        for s in np.unique(sid):
            hs, rs, cs = self._shard(int(s))
            m = sid == s
            if len(hs) == 0:
                continue
            hm = h[m]
            ix = np.minimum(np.searchsorted(hs, hm), len(hs) - 1)
            hit = hs[ix] == hm
            ranks[m] = np.where(hit, rs[ix], -1)
            cnts[m] = np.where(hit, cs[ix], 0)
        row_ids = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        perm = np.lexsort((ranks, row_ids))
        return ranks[perm], cnts[perm], lengths


# Above this many distinct (token, cnt) partial rows, build_token_order(auto)
# switches to the distributed HashedTokenOrder build instead of the driver
# concat. The partial-row count over-counts the vocabulary by up to the merge
# block count, so this is a conservative trigger.
HASHED_VOCAB_THRESHOLD = 3_000_000


def build_token_order(*tokenized_datasets, mode: str = "auto",
                      hashed_threshold: int = HASHED_VOCAB_THRESHOLD,
                      num_shards: int | None = None):
    """One streaming pass: per-batch combiners → coalesce to ~CPU-count blocks
    → second-level merge. Small vocabularies finish with a driver concat
    (driver sees at most blocks × vocab partial rows, never corpus-sized
    data); large ones never touch the driver — ``mode="hashed"`` (or auto
    above ``hashed_threshold``) runs a distributed groupby + sort and returns
    a :class:`HashedTokenOrder` with identical rank semantics.
    """
    import ray

    assert mode in ("auto", "driver", "hashed")
    ds = tokenized_datasets[0]
    for other in tokenized_datasets[1:]:
        ds = ds.union(other)
    partial = ds.map_batches(_partial_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    merged = (partial.repartition(max(2, min(ncpu, 32)))
                     .map_batches(_merge_partials, batch_format="pyarrow"))
    if mode != "driver":
        merged = merged.materialize()
        if mode == "hashed" or merged.count() > hashed_threshold:
            return _build_hashed_order(merged, num_shards or max(2, min(ncpu, 32)))
    pdf = merged.to_pandas()
    if pdf.empty or pdf["token"].notna().sum() == 0:
        n_empty = int(pdf["n_empty"].sum()) if "n_empty" in pdf else 0
        n_missing = int(pdf["n_missing"].sum()) if "n_missing" in pdf else 0
        return TokenOrder(pd.Index([], dtype=object),
                          np.array([], dtype=np.int64), n_empty, n_missing)
    n_empty = int(pdf["n_empty"].sum())
    n_missing = int(pdf["n_missing"].sum())
    counts = (pdf[pdf["token"].notna()]
              .groupby("token", as_index=False)["cnt"].sum()
              .sort_values(["cnt", "token"], kind="mergesort", ignore_index=True))
    return TokenOrder(pd.Index(counts["token"]),
                      counts["cnt"].to_numpy(dtype=np.int64),
                      n_empty, n_missing)


@ray.remote
def _hash_rank_block(block: pa.Table, rank_offset: int, num_shards: int):
    """(token, cnt) block of the globally-sorted counts → per-hash-shard
    (token_hash, rank, cnt) arrays. The block's position in the sorted
    dataset supplies the exact global rank via ``rank_offset``."""
    from rayssj.checkpoint import stable_hash64

    tok = block["token"]
    tok = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
    h = (stable_hash64(tok.cast(pa.string()))
         .to_numpy(zero_copy_only=False).view(np.uint64))
    ranks = rank_offset + np.arange(len(h), dtype=np.int64)
    cnts = block["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = np.uint64(2**64 // num_shards)
    sid = np.minimum(h // q, np.uint64(num_shards - 1)).astype(np.int64)
    out = []
    for s in range(num_shards):
        m = sid == s
        out.append((h[m], ranks[m], cnts[m]))
    return out


@ray.remote
def _merge_shard(*parts):
    """Concatenate one hash-range shard's pieces and sort by hash. Raises on
    a 64-bit token-hash collision (distinct tokens, equal hash) — rebuild
    with mode='driver' in that (~V²/2^65-probability) event."""
    h = np.concatenate([p[0] for p in parts]) if parts else np.array([], dtype=np.uint64)
    r = np.concatenate([p[1] for p in parts]) if parts else np.array([], dtype=np.int64)
    c = np.concatenate([p[2] for p in parts]) if parts else np.array([], dtype=np.int64)
    order = np.argsort(h, kind="stable")
    h, r, c = h[order], r[order], c[order]
    if len(h) > 1 and (h[1:] == h[:-1]).any():
        raise ValueError("token hash collision detected; rebuild the ordering "
                         "with build_token_order(..., mode='driver')")
    return h, r, c


def _build_hashed_order(merged, num_shards: int) -> "HashedTokenOrder":
    """Distributed finish of build_token_order: groupby-sum the partials,
    sort by (cnt, token), zip exact ranks from per-block offsets, reshard by
    token hash. The driver handles only ObjectRefs and block metadata."""
    from ray.data.aggregate import Sum

    markers = merged.map_batches(
        lambda t: t.filter(pc.is_null(t["token"])).select(["n_empty", "n_missing"]),
        batch_format="pyarrow")
    stats = markers.aggregate(Sum("n_empty", alias_name="n_empty"),
                              Sum("n_missing", alias_name="n_missing"))
    n_empty = int(stats.get("n_empty") or 0)
    n_missing = int(stats.get("n_missing") or 0)

    counts = (merged.map_batches(
                  lambda t: t.filter(pc.is_valid(t["token"])).select(["token", "cnt"]),
                  batch_format="pyarrow")
              .groupby("token").aggregate(Sum("cnt", alias_name="cnt")))
    sorted_ds = counts.sort(["cnt", "token"]).materialize()

    block_refs, offsets, off = [], [], 0
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            block_refs.append(ref)
            offsets.append(off)
            off += meta.num_rows
    size = off
    if size == 0:
        return TokenOrder(pd.Index([], dtype=object),
                          np.array([], dtype=np.int64), n_empty, n_missing)
    part_refs = [_hash_rank_block.options(num_returns=num_shards).remote(
                     ref, o, num_shards)
                 for ref, o in zip(block_refs, offsets)]
    # normalize: with num_returns=N each call yields a list of N refs
    shard_refs = [_merge_shard.remote(*[pr[s] for pr in part_refs])
                  for s in range(num_shards)]
    # surface collisions at build time, not first lookup (pulls only ints)
    ray.get([_shard_rows.remote(r) for r in shard_refs])
    return HashedTokenOrder(shard_refs, num_shards, n_empty, n_missing, size)


@ray.remote
def _shard_rows(shard) -> int:
    return len(shard[0])


def put_token_order(order: pd.Index):
    """Ship the rank index to the object store once; encoder actors ray.get it."""
    return ray.put(order)


def encode_ranks(list_arr: pa.ListArray, order: pd.Index):
    """token list array → (flat sorted ranks per row, row lengths).

    Fully vectorized: one get_indexer over the flattened tokens, then a single
    lexsort by (row, rank) to sort each row's ranks ascending.
    Returns (values int64 ndarray, lengths int64 ndarray).
    """
    values, lengths = _list_parts(list_arr)
    if len(values) == 0:
        return np.array([], dtype=np.int64), lengths
    toks = values.to_numpy(zero_copy_only=False)
    ranks = order.get_indexer(toks).astype(np.int64)
    n_rows = len(lengths)
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    sorted_ranks = ranks[np.lexsort((ranks, row_ids))]
    return sorted_ranks, lengths
