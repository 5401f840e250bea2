"""Approximate-nearest-neighbor search over an embedding column (graft
addition): brute-force cosine top-k baseline (numpy matmul per batch against a
broadcast query matrix) + an LSH-bucketed variant as the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from rayssj.joins import _as_dataset
from rayssj.tokenizers import _list_parts


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    values, lengths = _list_parts(batch[emb_col])
    if len(lengths) == 0:
        return np.zeros((0, 0), dtype=np.float32)
    dim = int(lengths[0])
    return values.to_numpy(zero_copy_only=False).astype(np.float32).reshape(len(lengths), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


# per-worker-process scorer cache (see dedup._HASHER_CACHE / joins._ORDER_CACHE)
_SCORER_CACHE: dict = {}


class _TopKScorer:
    """Batch scorer (cached once per worker process): cosine of every row
    against the broadcast query matrix; emits (query_id, key, _sim_score)
    for each batch-local top-k candidate. A small global top-k reduction
    finishes the job."""

    def __init__(self, queries_ref, key_col, emb_col, k):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float32))
        self.key_col = key_col
        self.emb_col = emb_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, self.emb_col))
        if m.size == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "key": pa.array([], type=batch[self.key_col].type),
                             "_sim_score": pa.array([], type=pa.float64())})
        sims = self.q @ m.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        qids = np.repeat(np.arange(len(self.q), dtype=np.int64), k)
        flat = idx.reshape(-1)
        scores = sims[np.repeat(np.arange(len(self.q)), k), flat]
        keys = batch[self.key_col].combine_chunks() if isinstance(batch[self.key_col], pa.ChunkedArray) else batch[self.key_col]
        # no rounding: rank boundaries must match a float-exact oracle
        return pa.table({"query_id": pa.array(qids),
                         "key": keys.take(pa.array(flat)),
                         "_sim_score": pa.array(scores.astype(np.float64))})


def knn_cosine(ds, queries: np.ndarray, key_col: str, emb_col: str = "embedding",
               k: int = 10, concurrency=(1, 8)):
    """Exact cosine top-k: distributed batch-local top-k (stateless tasks
    with a per-worker cache of the broadcast query matrix) → tiny global
    per-query top-k reduction. ``concurrency`` is accepted for backward
    compatibility but inert — tasks scale with the cluster.
    Returns Dataset (query_id, key, _sim_score) with exactly k rows/query."""
    from rayssj.joins import _probe_empty

    ds = _as_dataset(ds)
    if _probe_empty(ds):
        import ray.data as rd

        from rayssj.validation import _schema_of

        kt = _schema_of(ds).field(key_col).type
        return rd.from_arrow(pa.schema([
            ("query_id", pa.int64()), ("key", kt),
            ("_sim_score", pa.float64())]).empty_table())
    qref = ray.put(np.asarray(queries, dtype=np.float32))
    # stateless tasks + per-worker-process scorer cache (dedup/joins
    # pattern): the broadcast query matrix is fetched once per worker, no
    # per-query actor-pool spin-up, and no ctor-ObjectRef restart hazard
    # (Ray #53727)
    params = (qref.hex(), key_col, emb_col, k)

    def scorer_fn(batch: pa.Table, qref=qref, params=params) -> pa.Table:
        inst = _SCORER_CACHE.get(params)
        if inst is None:
            if len(_SCORER_CACHE) > 8:
                _SCORER_CACHE.clear()
            inst = _TopKScorer(qref, key_col, emb_col, k)
            _SCORER_CACHE[params] = inst
        return inst(batch)

    partial = ds.select_columns([key_col, emb_col]).map_batches(
        scorer_fn, batch_format="pyarrow", zero_copy_batch=True)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic tie-break on key (matches ORDER BY score DESC, key)
        return (g.sort_values(["_sim_score", "key"], ascending=[False, True])
                 .head(min(k, len(g))))

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def _spherical_kmeans(sample: np.ndarray, n_centroids: int, iters: int,
                      seed: int) -> np.ndarray:
    """Cosine k-means on a bounded sample: assign to argmax dot, recenter to
    the normalized mean; empty clusters re-seeded deterministically."""
    rng = np.random.default_rng(seed)
    m = _normalize(sample.astype(np.float32))
    k = min(n_centroids, len(m))
    cent = m[rng.choice(len(m), size=k, replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                cent[c] = members.sum(axis=0)
            else:
                cent[c] = m[rng.integers(0, len(m))]
        cent = _normalize(cent)
    return cent


def knn_cosine_ivf(ds, queries: np.ndarray, key_col: str,
                   emb_col: str = "embedding", k: int = 10,
                   n_centroids: int = 64, n_probe: int = 8,
                   sample_size: int = 100_000, kmeans_iters: int = 10,
                   seed: int = 42, concurrency=(1, 8)):
    """IVF ANN (scale path): a coarse spherical-k-means quantizer is trained
    on a BOUNDED random sample (driver-side numpy — the only non-distributed
    step, capped by ``sample_size``); rows are pre-filtered to the union of
    each query's ``n_probe`` nearest centroid cells inside ``map_batches``
    (broadcast centroids, vectorized argmax per batch), then scored by the
    exact batch-local top-k reduction of :func:`knn_cosine`. Approximate by
    construction — recall grows with ``n_probe``; ``n_probe >= n_centroids``
    degrades to exact brute force."""
    ds = _as_dataset(ds)
    n = ds.count()
    if n == 0:
        return knn_cosine(ds, queries, key_col, emb_col, k, concurrency)
    frac = min(1.0, sample_size / n)
    sample_ds = ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    sample = np.stack([np.asarray(r[emb_col], dtype=np.float32)
                       for r in sample_ds.select_columns([emb_col]).take_all()])
    cent = _spherical_kmeans(sample, n_centroids, kmeans_iters, seed)

    q = _normalize(np.asarray(queries, dtype=np.float32))
    n_probe = min(n_probe, len(cent))
    probe = np.unique(
        np.argpartition(-(q @ cent.T), kth=n_probe - 1, axis=1)[:, :n_probe])
    cent_ref = ray.put(cent)
    probe_ref = ray.put(probe)

    def prefilter(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, emb_col))
        if m.size == 0:
            return batch
        cell = (m @ ray.get(cent_ref).T).argmax(axis=1)
        keep = np.isin(cell, ray.get(probe_ref))
        return batch.filter(pa.array(keep))

    filtered = ds.select_columns([key_col, emb_col]).map_batches(
        prefilter, batch_format="pyarrow")
    return knn_cosine(filtered, queries, key_col, emb_col, k, concurrency)


def knn_cosine_lsh(ds, queries: np.ndarray, key_col: str,
                   emb_col: str = "embedding", k: int = 10, n_planes: int = 4,
                   n_probe_bits: int = 1, seed: int = 42, concurrency=(1, 8)):
    """LSH-bucketed ANN (scale path): rows are pre-filtered to buckets whose
    hyperplane signature is within ``n_probe_bits`` of a query's signature —
    only that fraction of rows is scored. Approximate by construction."""
    ds = _as_dataset(ds)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)

    def sig_of(m: np.ndarray) -> np.ndarray:
        bits = (m @ planes > 0).astype(np.uint32)
        out = np.zeros(len(m), dtype=np.uint32)
        for j in range(n_planes):
            out = (out << np.uint32(1)) | bits[:, j]
        return out

    qsig = sig_of(q)
    # expand query signatures to all buckets within hamming n_probe_bits
    probe: set[int] = set()
    for s in qsig.tolist():
        probe.add(s)
        if n_probe_bits >= 1:
            for b in range(n_planes):
                probe.add(s ^ (1 << b))
    probe_arr = np.array(sorted(probe), dtype=np.uint32)
    probe_ref = ray.put(probe_arr)

    def prefilter(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, emb_col))
        if m.size == 0:
            return batch
        s = sig_of(m)
        keep = np.isin(s, ray.get(probe_ref))
        return batch.filter(pa.array(keep))

    filtered = ds.select_columns([key_col, emb_col]).map_batches(
        prefilter, batch_format="pyarrow")
    return knn_cosine(filtered, queries, key_col, emb_col, k, concurrency)
