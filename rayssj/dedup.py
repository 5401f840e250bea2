"""Deduplication operators for training-data pipelines (graft additions):
exact (hash-partition + per-group first), MinHash+LSH near-dup, SimHash,
n-gram-Jaccard near-dup, embedding-cosine near-dup.

All scale-shaped: hashing/sketching is a vectorized ``map_batches``; the only
shuffle is a groupby on the dedup key / LSH band bucket; candidate
verification happens inside group kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rayssj.checkpoint import stable_hash64
from rayssj.joins import _as_dataset, _rename_ds
from rayssj.tokenizers import _list_parts

# ---------------------------------------------------------------- exact dedup


def exact_dedup(ds, text_col: str, key_col: str):
    """Keep one row (min key) per distinct text value.

    hash(text) added per batch (vectorized) → groupby(hash) →
    per-group min-key winner; full text compared inside the group so hash
    collisions cannot merge distinct texts.
    """
    ds = _as_dataset(ds)

    def add_hash(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return batch.append_column("__h", stable_hash64(col.fill_null("")))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(key_col, kind="mergesort")
                 .drop_duplicates(subset=[text_col], keep="first"))

    return (ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
              .groupby("__h").map_groups(keep_first, batch_format="pandas")
              .drop_columns(["__h"]))


# ------------------------------------------------------------------- shingles


def _shingle_hashes(texts, k: int = 5):
    """Per text: uint64 hashes of its k-char shingles (vectorized across the
    whole batch via one rolling polynomial pass)."""
    lens = np.array([max(len(t) - k + 1, 0) for t in texts], dtype=np.int64)
    out = []
    P = np.uint64(1099511628211)
    for t in texts:
        if len(t) < k:
            out.append(np.array([], dtype=np.uint64))
            continue
        b = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        # width-k polynomial hash at every offset: k strided adds, no per-
        # shingle Python work
        acc = np.zeros(len(b) - k + 1, dtype=np.uint64)
        for j in range(k):
            acc = acc * P + b[j:j + len(acc)]
        h = acc
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        out.append(np.unique(h))
    return out, lens


class MinHasher:
    """Actor-pool stage: text → ``minhash`` (list<uint64> of num_perm values).

    Universal-hash permutations h_i(x) = (a_i x + b_i) mod p, parameters fixed
    by seed (deterministic across runs/actors).
    """

    def __init__(self, text_col: str = "text", num_perm: int = 64,
                 shingle_k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.p = np.uint64((1 << 61) - 1)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col

    def minhash(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (num_perm, n_shingles) via broadcasting, min over shingles
        vals = (self.a[:, None] * (shingles[None, :] % self.p) + self.b[:, None]) % self.p
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        sh, _ = _shingle_hashes(texts, self.k)
        mh = np.stack([self.minhash(s) for s in sh]) if texts else \
            np.zeros((0, self.num_perm), dtype=np.uint64)
        offsets = np.arange(0, (len(texts) + 1) * self.num_perm, self.num_perm,
                            dtype=np.int64)
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets), pa.array(mh.reshape(-1).view(np.int64)))
        return batch.append_column("minhash", lst)


def minhash_lsh_pairs(ds, key_col: str, text_col: str = "text",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      jaccard_threshold: float = 0.7, seed: int = 42,
                      concurrency=(1, 8)):
    """MinHash-LSH candidate pairs verified by minhash-estimated Jaccard:
    sketch (actor pool) → explode (band_id, band_hash) rows → groupby bucket →
    in-bucket pair-gen → estimate sim from full sketches → threshold.

    Returns Dataset (l_<key>, r_<key>, _sim_score[estimated jaccard]).
    """
    ds = _as_dataset(ds)
    rows_per_band = num_perm // bands
    assert rows_per_band * bands == num_perm

    sketched = ds.select_columns([key_col, text_col]).map_batches(
        MinHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(text_col=text_col, num_perm=num_perm,
                                   shingle_k=shingle_k, seed=seed),
        concurrency=concurrency)

    def explode_bands(batch: pa.Table) -> pa.Table:
        values, lengths = _list_parts(batch["minhash"])
        n = len(lengths)
        mh = values.to_numpy(zero_copy_only=False).view(np.uint64).reshape(n, num_perm)
        bh = np.zeros((n, bands), dtype=np.uint64)
        P = np.uint64(1099511628211)
        for b in range(bands):
            seg = mh[:, b * rows_per_band:(b + 1) * rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                acc = acc * P + seg[:, j]
            bh[:, b] = acc
        keys = batch[key_col].combine_chunks() if isinstance(batch[key_col], pa.ChunkedArray) else batch[key_col]
        row_ids = np.repeat(np.arange(n, dtype=np.int64), bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
        lst = batch["minhash"].combine_chunks() if isinstance(batch["minhash"], pa.ChunkedArray) else batch["minhash"]
        return pa.table({
            "band": pa.array(band_ids),
            "bh": pa.array(bh.reshape(-1).view(np.int64)),
            "key": keys.take(pa.array(row_ids)),
            "minhash": lst.take(pa.array(row_ids)),
        })

    exploded = sketched.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_kernel(tbl: pa.Table) -> pa.Table:
        keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
        empty = pa.table({"l_key": pa.array([], type=keys.type),
                          "r_key": pa.array([], type=keys.type),
                          "_sim_score": pa.array([], type=pa.float64())})
        n = tbl.num_rows
        if n < 2:
            return empty
        values, lengths = _list_parts(tbl["minhash"])
        mh = values.to_numpy(zero_copy_only=False).view(np.uint64).reshape(n, num_perm)
        iu, ju = np.triu_indices(n, k=1)
        est = (mh[iu] == mh[ju]).mean(axis=1)
        keep = est >= jaccard_threshold
        iu, ju, est = iu[keep], ju[keep], est[keep]
        if len(iu) == 0:
            return empty
        lk = keys.take(pa.array(iu))
        rk = keys.take(pa.array(ju))
        swap = pc.greater(lk, rk)
        lk, rk = pc.if_else(swap, rk, lk), pc.if_else(swap, lk, rk)
        m = pc.not_equal(lk, rk).to_numpy(zero_copy_only=False)
        return pa.table({"l_key": lk.filter(pa.array(m)),
                         "r_key": rk.filter(pa.array(m)),
                         "_sim_score": pa.array(np.round(est[m], 6))})

    pairs = exploded.groupby(["band", "bh"]).map_groups(
        bucket_kernel, batch_format="pyarrow")
    # a pair can collide in several bands → dedup
    uniq = pairs.groupby(["l_key", "r_key"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
    return _rename_ds(uniq, {"l_key": f"l_{key_col}", "r_key": f"r_{key_col}"})


def minhash_dedup(ds, key_col: str, text_col: str = "text", **kwargs):
    """Near-dup removal: LSH pairs → connected components → keep min-key per
    component."""
    from rayssj.cluster import connected_components

    ds = _as_dataset(ds)
    pairs = minhash_lsh_pairs(ds, key_col, text_col, **kwargs)
    comps = connected_components(pairs, f"l_{key_col}", f"r_{key_col}")
    losers = comps.map_batches(
        lambda t: t.filter(pc.not_equal(t["node"], t["component"])).select(["node"]),
        batch_format="pyarrow")
    loser_keys = set(r["node"] for r in losers.take_all())
    import ray

    ref = ray.put(loser_keys)

    def drop(batch: pa.Table) -> pa.Table:
        import ray as _r

        lk = _r.get(ref)
        keys = batch[key_col].to_pylist()
        mask = pa.array([k not in lk for k in keys])
        return batch.filter(mask)

    return ds.map_batches(drop, batch_format="pyarrow")


# --------------------------------------------------------------------- simhash


class SimHasher:
    """text → 64-bit SimHash over shingle hashes (vectorized bit-count)."""

    def __init__(self, text_col: str = "text", shingle_k: int = 5):
        self.text_col = text_col
        self.k = shingle_k
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        sh, _ = _shingle_hashes(texts, self.k)
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, s in enumerate(sh):
            if len(s) == 0:
                continue
            bits = (s[:, None] & self.bits[None, :]) != 0
            score = bits.sum(axis=0) * 2 - len(s)
            out[i] = np.uint64(((score > 0).astype(np.uint64) * self.bits).sum())
        return batch.append_column("simhash", pa.array(out.view(np.int64)))


def simhash_pairs(ds, key_col: str, text_col: str = "text", shingle_k: int = 5,
                  max_hamming: int = 3, concurrency=(1, 8)):
    """Near-dup candidates with Hamming(simhash) <= max_hamming, blocked on
    16-bit simhash quadrants (a pair within distance 3 shares >= 1 intact
    quadrant of its 64-bit hash — pigeonhole)."""
    ds = _as_dataset(ds)
    sketched = ds.select_columns([key_col, text_col]).map_batches(
        SimHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(text_col=text_col, shingle_k=shingle_k),
        concurrency=concurrency)

    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks

    def explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(h)
        keys = batch[key_col].combine_chunks() if isinstance(batch[key_col], pa.ChunkedArray) else batch[key_col]
        parts = []
        for c in range(n_chunks):
            frag = (h >> np.uint64(c * chunk_bits)) & np.uint64((1 << chunk_bits) - 1)
            parts.append(pa.table({
                "chunk": pa.array(np.full(n, c, dtype=np.int64)),
                "frag": pa.array(frag.view(np.int64)),
                "key": keys,
                "simhash": batch["simhash"],
            }))
        return pa.concat_tables(parts)

    exploded = sketched.map_batches(explode, batch_format="pyarrow")

    def bucket_kernel(tbl: pa.Table) -> pa.Table:
        keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
        empty = pa.table({"l_key": pa.array([], type=keys.type),
                          "r_key": pa.array([], type=keys.type),
                          "_sim_score": pa.array([], type=pa.float64())})
        n = tbl.num_rows
        if n < 2:
            return empty
        h = tbl["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        iu, ju = np.triu_indices(n, k=1)
        x = h[iu] ^ h[ju]
        # vectorized popcount
        dist = np.zeros(len(x), dtype=np.int64)
        v = x.copy()
        for _ in range(8):
            dist += np.unpackbits((v & np.uint64(0xFF)).astype(np.uint8)).reshape(-1, 8).sum(1).astype(np.int64)
            v >>= np.uint64(8)
        keep = dist <= max_hamming
        iu, ju, dist = iu[keep], ju[keep], dist[keep]
        if len(iu) == 0:
            return empty
        lk, rk = keys.take(pa.array(iu)), keys.take(pa.array(ju))
        swap = pc.greater(lk, rk)
        lk, rk = pc.if_else(swap, rk, lk), pc.if_else(swap, lk, rk)
        m = pc.not_equal(lk, rk).to_numpy(zero_copy_only=False)
        return pa.table({"l_key": lk.filter(pa.array(m)),
                         "r_key": rk.filter(pa.array(m)),
                         "_sim_score": pa.array(dist[m].astype(np.float64))})

    pairs = exploded.groupby(["chunk", "frag"]).map_groups(
        bucket_kernel, batch_format="pyarrow")
    uniq = pairs.groupby(["l_key", "r_key"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
    return _rename_ds(uniq, {"l_key": f"l_{key_col}", "r_key": f"r_{key_col}"})


# ----------------------------------------------------- embedding cosine dedup


def embedding_cosine_pairs(ds, key_col: str, emb_col: str = "embedding",
                           threshold: float = 0.95, num_buckets: int = 1,
                           seed: int = 42):
    """Near-dup pairs by embedding cosine >= threshold.

    Baseline path (num_buckets=1): one group, blocked numpy matmul.
    Scale path: LSH bucketing by sign of random hyperplane projections
    (num_buckets = 2^n_planes groups; only intra-bucket pairs compared —
    approximate, documented).
    """
    ds = _as_dataset(ds)

    n_planes = max(int(np.log2(max(num_buckets, 1))), 0)

    def prep(batch: pa.Table) -> pa.Table:
        values, lengths = _list_parts(batch[emb_col])
        dim = int(lengths[0]) if len(lengths) else 0
        v = values.to_numpy(zero_copy_only=False).astype(np.float32).reshape(len(lengths), dim)
        norm = np.linalg.norm(v, axis=1, keepdims=True)
        v = v / np.maximum(norm, 1e-12)
        if n_planes:
            rng = np.random.default_rng(seed)
            planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
            sig = (v @ planes > 0).astype(np.uint64)
            bucket = np.zeros(len(v), dtype=np.uint64)
            for j in range(n_planes):
                bucket = (bucket << np.uint64(1)) | sig[:, j]
        else:
            bucket = np.zeros(len(v), dtype=np.uint64)
        keys = batch[key_col].combine_chunks() if isinstance(batch[key_col], pa.ChunkedArray) else batch[key_col]
        offs = np.arange(0, (len(v) + 1) * dim, dim, dtype=np.int64)
        lst = pa.LargeListArray.from_arrays(pa.array(offs),
                                            pa.array(v.reshape(-1).astype(np.float64)))
        return pa.table({"bucket": pa.array(bucket.view(np.int64)),
                         "key": keys, "vec": lst})

    prepped = ds.select_columns([key_col, emb_col]).map_batches(
        prep, batch_format="pyarrow")

    def bucket_kernel(tbl: pa.Table) -> pa.Table:
        keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
        empty = pa.table({"l_key": pa.array([], type=keys.type),
                          "r_key": pa.array([], type=keys.type),
                          "_sim_score": pa.array([], type=pa.float64())})
        n = tbl.num_rows
        if n < 2:
            return empty
        values, lengths = _list_parts(tbl["vec"])
        dim = int(lengths[0])
        v = values.to_numpy(zero_copy_only=False).reshape(n, dim)
        sims = v @ v.T
        iu, ju = np.triu_indices(n, k=1)
        s = sims[iu, ju]
        keep = s >= threshold
        iu, ju, s = iu[keep], ju[keep], s[keep]
        if len(iu) == 0:
            return empty
        lk, rk = keys.take(pa.array(iu)), keys.take(pa.array(ju))
        swap = pc.greater(lk, rk)
        lk, rk = pc.if_else(swap, rk, lk), pc.if_else(swap, lk, rk)
        return pa.table({"l_key": lk, "r_key": rk,
                         "_sim_score": pa.array(np.round(s, 6))})

    pairs = prepped.groupby("bucket").map_groups(bucket_kernel,
                                                 batch_format="pyarrow")
    return _rename_ds(pairs, {"l_key": f"l_{key_col}", "r_key": f"r_{key_col}"})
