"""Public join API — Ray-Data-native set-similarity and edit-distance joins.

Reference semantics: SURVEY.md §2.1 rows 1-6 and §2.2
[ref: py_stringsimjoin/join/jaccard_join.py:~20, join/set_sim_join_py.py:~30,
join/edit_distance_join.py:~25 †U]. The execution is NOT the reference's
index-probe loop: both sides are tokenized in zero-copy Arrow ``map_batches``
stages, globally token-ordered, exploded to prefix-token rows and co-grouped by
one ``groupby(bucket)`` shuffle where numpy kernels generate, prune
(size/positional bounds) and verify candidates (SURVEY.md §2.4, §7.3).

Pipeline (lazy, streaming end-to-end):
  read → tokenize(map_batches) → [token-freq combiner → groupby → rank dict
  broadcast] → rank-encode + prefix-explode (actor pool, map_batches) →
  groupby(ptok % NB) → bucket kernel (pair-gen + verify) → out-attr join →
  output Dataset

Scale notes: the only broadcast state is the vocabulary rank index
(SURVEY.md §4 delta 3); exploded rows carry urls + int64 rank arrays, never the
raw html/text (set measures). ``num_buckets`` bounds shuffle fan-in and is the
salting granularity knob.
"""

from __future__ import annotations

import copy
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from rayssj import filter_utils as fu
from rayssj.kernels import make_edit_distance_bucket_kernel, make_set_sim_bucket_kernel
from rayssj.ordering import TOKENS_COL, build_token_order
from rayssj.validation import validate_join_inputs

DEFAULT_NUM_BUCKETS = 64   # floor; see default_num_buckets()
_MAX_NUM_BUCKETS = 4096    # heavy rank-payload rows ship once per
                           # (record, bucket), so dup grows with buckets until
                           # it saturates at the per-record cell spread:
                           # 384 buckets tripled the sort payload at 32 CPUs
                           # (1.3GB -> 4.0GB) for no kernel-CPU win


def default_num_buckets() -> int:
    """Kernel co-group bucket count, scaled with cluster CPUs.

    Finer buckets flatten kernel task skew (measured at 32 CPUs on the 4x
    sf0.1 scaling job: 64 buckets -> max task 18.7-35s vs mean 9-12s; 192
    buckets + 4x-CPU input blocks -> max 9.8-12.9s vs mean 4-5s, same total
    CPU), which is what protects the high-parallelism makespan. Bounded above
    because heavy-row duplication grows with the bucket count (see
    _MAX_NUM_BUCKETS) and below so small test clusters keep the round-2
    measured configuration."""
    env = int(os.environ.get("RAYSSJ_NUM_BUCKETS", "0"))
    if env:
        return env
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return int(min(max(cpus * 6, DEFAULT_NUM_BUCKETS), _MAX_NUM_BUCKETS))


# Broadcast-ranks mode: light rows ship once regardless of the bucket count
# (no heavy-row payload duplication), so buckets are nearly free — size them
# from the DATA so the heaviest load class spreads across enough groups that
# no single group dominates the stage makespan. Calibrated on the 8x sf0.1
# scaling job (5.86M gram occurrences) at 32 CPUs: NB=192 (cpu-scaled
# default) wall 354s — one 2M-row heavy-class group ran 104s single-threaded;
# NB=1536 134s; NB=4096 123s; NB=8192 157s (per-group overhead).
_BCAST_OCC_PER_BUCKET = 1500


def bcast_num_buckets(order) -> int:
    """Data-driven bucket count for broadcast-ranks joins: one bucket per
    ~_BCAST_OCC_PER_BUCKET token occurrences, floored at the cpu-scaled
    default and capped at _MAX_NUM_BUCKETS. Intentionally independent of the
    cluster size above the floor — the same corpus gets the same kernel task
    granularity at every parallelism level."""
    env = int(os.environ.get("RAYSSJ_NUM_BUCKETS", "0"))
    if env:
        return env
    counts = getattr(order, "counts", None)
    occ = int(counts.sum()) if counts is not None else 0
    return int(min(max(occ // _BCAST_OCC_PER_BUCKET, default_num_buckets()),
                   _MAX_NUM_BUCKETS))


def join_num_partitions() -> int:
    """Partition count for Dataset.join (hash-shuffle aggregator actors):
    scale with cluster CPUs — 64 aggregators on a 4-CPU local cluster would
    starve the actor-pool stages (observed deadlock)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    # 1x CPUs: doubling partitions recreated the chained-join aggregator
    # deadlock on a 4-CPU cluster (distributed label propagation hung), and
    # measured no scaling benefit at 32 CPUs
    return max(2, min(32, cpus))





# Worker-process-local caches: stateless map tasks get actor-style state
# amortization (the broadcast TokenOrder is fetched+deserialized once per
# worker PROCESS, not per task) without paying actor-pool spin-up on every
# execution (measured: 64 fresh actor processes per query at 32 CPUs).
_ORDER_CACHE: dict = {}


def _cached_order(order_ref):
    key = order_ref.hex() if hasattr(order_ref, "hex") else id(order_ref)
    if key not in _ORDER_CACHE:
        _ORDER_CACHE.clear()  # one live ordering per worker is plenty
        _ORDER_CACHE[key] = ray.get(order_ref) if hasattr(order_ref, "hex") else order_ref
    return _ORDER_CACHE[key]


def make_explode_fn(cls, order_ref, **kw):
    """Stateless map_batches fn wrapping an exploder; instance cached per
    worker process keyed by (class, ordering, params)."""
    params = tuple(sorted(kw.items()))

    def fn(batch):
        key = (cls.__name__, order_ref.hex() if hasattr(order_ref, "hex") else id(order_ref), params)
        inst = _ORDER_CACHE.get(key)
        if inst is None:
            inst = cls(_cached_order(order_ref), **kw)
            _ORDER_CACHE[key] = inst
        return inst(batch)

    return fn

def _pool_size():
    """Exploder actor-pool bounds: scale with the cluster (a fixed cap of 8
    actors serializes the explode stage at 32 CPUs and flattens scaling)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(8, cpus * 2))

_MATERIALIZE_TOKENS_MAX_BYTES = 512 * 1024 * 1024


def _ensure_parallel(ds):
    """Small inputs (single parquet file → ONE block) would run every map
    stage as a single task; split them so tokenize/explode/shuffle-map run
    wide. Large inputs already arrive as many blocks — leave them alone."""
    try:
        nbytes = ds.size_bytes()
    except Exception:
        nbytes = None
    if nbytes is not None and 0 < nbytes < _MATERIALIZE_TOKENS_MAX_BYTES:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        # cpus*4 input blocks -> cpus*4 kernel tasks under sort-shuffle
        # (output partition count tracks input block count, NOT the groupby's
        # num_partitions); measured at 32 CPUs on the 4x sf0.1 scaling job:
        # 64 tasks max 18.7-35s vs mean 9-12s; 128 tasks max 9.8-12.9s —
        # flatter makespan, same total CPU
        mult = int(os.environ.get("RAYSSJ_PARALLEL_MULT", "4"))
        return ds.repartition(cpus * mult)
    return ds


def _probe_empty(ds) -> bool:
    """True iff the dataset has zero rows. Bounded probe — ``limit(1)`` stops
    the upstream after the first row, so nonempty inputs pay for one block.

    Needed because Ray 2.49's hash-shuffle groupby crashes with ArrowInvalid
    ('No match for FieldRef.Name(...)') when EVERY input block is empty: the
    shuffle has no schema to sort by. Empirically (repro kept in git history):
    mixed empty+nonempty blocks are fine; all-empty is a deterministic crash.
    """
    try:
        return ds.limit(1).count() == 0
    except Exception:
        return False


def _empty_pairs_output(l_schema, r_schema, l_key_attr, r_key_attr,
                        l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix,
                        out_sim_score):
    """Correctly-shaped TYPED zero-row result for empty-input joins/filters
    (an untyped empty pandas frame loses its columns through Ray)."""
    import ray.data as rd

    fields = [pa.field(l_out_prefix + l_key_attr, l_schema.field(l_key_attr).type),
              pa.field(r_out_prefix + r_key_attr, r_schema.field(r_key_attr).type)]
    fields += [pa.field(l_out_prefix + a, l_schema.field(a).type)
               for a in (l_out_attrs or [])]
    fields += [pa.field(r_out_prefix + a, r_schema.field(a).type)
               for a in (r_out_attrs or [])]
    if out_sim_score:
        fields.append(pa.field("_sim_score", pa.float64()))
    return rd.from_arrow(pa.schema(fields).empty_table())


def _maybe_cache(tok_ds, src_ds):
    """Pin the tokenized dataset in the object store when the SOURCE is small
    (< 512MB estimate): the ordering pass and the explode pass both consume it,
    and recomputing tokenization twice costs more than the pin. Large inputs
    keep streaming (lazy recompute) — never materialize the big side."""
    try:
        nbytes = src_ds.size_bytes()
    except Exception:
        nbytes = None
    if nbytes is not None and 0 < nbytes < _MATERIALIZE_TOKENS_MAX_BYTES:
        return tok_ds.materialize()
    return tok_ds


def _use_hash_shuffle():
    """Set GLOBAL shuffle knobs: hash shuffle for Dataset.join / small
    co-group ops + fractional aggregator reservations. The bucket groupby
    itself pins SORT on its own dataset context (see _bucket_groupby) —
    measured faster at 32 CPUs on the wide exploded payload. NOTE:
    DataContext is snapshotted per dataset at creation, so this global call
    only affects datasets created afterwards."""
    try:
        from ray.data.context import DataContext, ShuffleStrategy

        ctx = DataContext.get_current()
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # fractional aggregator reservations: several concurrent shuffles
        # (join + bucket groupby + cluster rounds) would otherwise stack
        # full-CPU aggregator actors and starve a small cluster (observed
        # 16 aggregators deadlocking 4 CPUs)
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05
        ctx.join_operator_actor_num_cpus_per_partition_override = 0.05
        # a bare groupby() under hash shuffle defaults to 64 partitions ->
        # 64 aggregator actors, which can never all schedule on a small
        # cluster (observed 44+ pending, pipeline deadlocked); keep shuffle
        # width proportional to the cluster
        np_ = join_num_partitions()
        ctx.default_hash_shuffle_parallelism = np_
        ctx.max_hash_shuffle_aggregators = np_
    except Exception:
        pass


def _bucket_groupby(exploded):
    _use_hash_shuffle()  # global knobs for ops created later (joins etc.)
    # Pin SORT-based shuffle for the bucket groupby on THIS dataset's captured
    # context: DataContext is snapshotted per dataset at creation, so the
    # strategy actually used depended on creation order relative to the first
    # join call (nondeterministic across query sequences). Measured at 32
    # CPUs on the scaling input: sort 42s vs hash 90s end-to-end — the hash
    # aggregators sort each partition anyway (finalize sort_by) and their
    # actors contend with the kernel tasks.
    try:
        from ray.data.context import ShuffleStrategy

        if os.environ.get("RAYSSJ_BUCKET_SHUFFLE", "sort") == "hash":
            exploded.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        else:
            exploded.context.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    except Exception:
        pass
    nparts = int(os.environ.get("RAYSSJ_GROUPBY_PARTS", "0")) or join_num_partitions()
    return exploded.groupby("bucket", num_partitions=nparts)


_AGG_REMOTE_ARGS = {"num_cpus": 0.125, "memory": 256 * 1024 * 1024}


def hash_join(left, right, on, right_on, join_type="inner"):
    """All Dataset.join calls go through here: hash shuffle with FRACTIONAL
    aggregator reservations. Chained joins (candset string fetch, cluster
    label rounds) otherwise stack enough full-size aggregator actors to
    starve a small cluster outright (observed: 20 actors pinning all 4 test
    CPUs, pipeline deadlocked)."""
    _use_hash_shuffle()
    # pin the fractional-aggregator knobs on the operands' CAPTURED contexts
    # (per-dataset snapshots; the global setting misses pre-created datasets)
    for ds in (left, right):
        try:
            ctx = ds.context
            ctx.join_operator_actor_num_cpus_per_partition_override = 0.05
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
            ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05
        except Exception:
            pass
    # Scrub ZERO-COLUMN empty blocks (map_groups emits them for empty sort
    # partitions, and default map_batches SKIPS empty blocks, so they survive
    # every later stage): a join hash-partition fed only such blocks crashes
    # pyarrow Table.join with 'No match for FieldRef.Name(...)'. An explicit
    # batch_size forces the bundler to coalesce, which drops empties.
    left = _scrub_empty_blocks(left)
    right = _scrub_empty_blocks(right)
    return left.join(right, join_type, num_partitions=join_num_partitions(),
                     on=on, right_on=right_on,
                     aggregator_ray_remote_args=dict(_AGG_REMOTE_ARGS))


def _scrub_empty_blocks(ds):
    """Drop zero-column empty blocks; see hash_join. One streaming Arrow pass,
    block sizes re-bundled up to 256k rows."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=1 << 18)

def _as_dataset(table):
    import ray.data as rd

    if isinstance(table, rd.Dataset):
        return table
    if isinstance(table, pd.DataFrame):
        return rd.from_arrow(pa.Table.from_pandas(
            table.reset_index(drop=True),
            preserve_index=False).replace_schema_metadata(None))
    if isinstance(table, pa.Table):
        return rd.from_arrow(table)
    raise AssertionError("input table must be a ray.data.Dataset, pandas DataFrame or pyarrow Table")


def _clone_tokenizer(tokenizer, return_set: bool):
    tk = copy.copy(tokenizer)
    tk.set_return_set(return_set)
    return tk


def _tokenize_stage(ds, key_attr: str, join_attr: str, tokenizer, keep_string: bool):
    """select [key, join] → (key, [s,] __tokens); drops nothing yet."""
    cols = [key_attr, join_attr]

    def fn(batch: pa.Table) -> pa.Table:
        toks = tokenizer.tokenize_batch(batch[join_attr])
        out = {"key": batch[key_attr], TOKENS_COL: toks}
        if keep_string:
            out["s"] = batch[join_attr]
        return pa.table(out)

    return ds.select_columns(cols).map_batches(fn, batch_format="pyarrow",
                                               zero_copy_batch=True)


def _drop_missing(tok_ds):
    """Rows with a null join attr (null __tokens) are excluded from the join
    [ref: utils/missing_value_handler.py †U]."""
    return tok_ds.map_batches(
        lambda t: t.filter(pc.is_valid(t[TOKENS_COL])),
        batch_format="pyarrow", zero_copy_batch=True)


# hot-token salting grid (SURVEY.md §4 'Skew / hot tokens'): a token whose
# postings exceed SALT_TARGET records is split into s = ceil(df/SALT_TARGET)
# sub-chunks per side (s <= SALT_MAX); each pair meets in exactly ONE of the
# s×s grid cells, so dedup semantics are unchanged while kernel parallelism
# for the hot token grows s²-fold.
SALT_TARGET = int(os.environ.get("RAYSSJ_SALT_TARGET", "1536"))
SALT_MAX = int(os.environ.get("RAYSSJ_SALT_MAX", "16"))


def _salt_cells(ptok, row_ids, keyhash, df, side, self_mode,
                salt_target=None):
    """Expand exploded rows into salting-grid cells.

    ``df``: per-exploded-row token document frequency (pre-gathered by the
    caller from the order's counts — works for both TokenOrder and
    HashedTokenOrder). Returns (rep, grp, out_side): ``rep`` indexes the
    original exploded rows (each row replicated s_token times), ``grp`` =
    ptok*SALT_MAX² + cell id, ``out_side`` the row's role inside its cell.
    """
    tgt = salt_target or SALT_TARGET
    s = np.clip((df + tgt - 1) // tgt, 1, SALT_MAX).astype(np.int64)
    salt = keyhash[row_ids] % s
    total = int(s.sum())
    rep = np.repeat(np.arange(len(ptok), dtype=np.int64), s)
    first = np.zeros(len(ptok), dtype=np.int64)
    np.cumsum(s[:-1], out=first[1:])
    x = np.arange(total, dtype=np.int64) - first[rep]
    a = salt[rep]
    if self_mode:
        ca = np.where(x >= a, a, x)
        cb = np.where(x >= a, x, a)
        out_side = (x < a).astype(np.int8)
    elif side == 0:
        ca, cb = a, x
        out_side = np.zeros(total, dtype=np.int8)
    else:
        ca, cb = x, a
        out_side = np.ones(total, dtype=np.int8)
    grp = ptok[rep] * (SALT_MAX * SALT_MAX) + ca * SALT_MAX + cb
    return rep, grp, out_side



def _mix_bucket(grp: np.ndarray, num_buckets: int) -> np.ndarray:
    """Avalanche grp before the modulo — grp = ptok*SALT_MAX² + cell is
    structured (low bits carry only the cell id), so a plain ``% NB`` with
    NB <= SALT_MAX² collapses every token into a handful of buckets."""
    v = grp.astype(np.uint64)
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    v ^= v >> np.uint64(31)
    return (v % np.uint64(num_buckets)).astype(np.int64)


_LOAD_CLASSES = 6  # factor-4 expected-cell-row bands


def _load_ordered_bucket(grp: np.ndarray, num_buckets: int,
                         cell_rows: np.ndarray) -> np.ndarray:
    """Class-major bucket ids: cells in heavier load classes get LOWER ids.

    Kernel work per cell is ~quadratic in its row count, but the sort-range
    partitioner balances ROWS — so a partition holding one monster cell costs
    several times its peers and, scheduled late, becomes the straggler that
    sets the stage makespan. Classing the bucket id by expected cell rows
    (factor-4 bands; heaviest class first) makes partitions work-homogeneous
    and schedules the expensive ones first, leaving a cheap tail. The id
    range stays [0, num_buckets), so resumable bucket-range partitioning
    (pipelines) is unaffected."""
    w = max(num_buckets // _LOAD_CLASSES, 1)
    cls = np.log2(np.maximum(cell_rows, 1)).astype(np.int64) // 2
    cls = np.clip(cls, 0, _LOAD_CLASSES - 1)
    return (_LOAD_CLASSES - 1 - cls) * w + _mix_bucket(grp, w)

def _key_hash(keys: pa.Array) -> np.ndarray:
    from rayssj.checkpoint import stable_hash64

    return stable_hash64(keys).to_numpy(zero_copy_only=False).view(np.uint64) \
        .astype(np.int64) % np.int64(2**62)


# Broadcast-ranks mode: when the ENCODED token table (flat sorted rank arrays
# for every record) fits comfortably in the object store, ship it ONCE via
# ray.put and let kernel tasks look rank slices up by key hash — instead of
# duplicating each record's rank array across every (record, bucket) heavy
# row in the sort shuffle (~#buckets-fold byte amplification on dense
# corpora; measured 0.3 GB light vs 1.0+ GB heavy on the sf0.1 scaling job).
# On a multi-node cluster the object is fetched once per NODE. Above the cap
# (or when the ordering itself is distributed — HashedTokenOrder, i.e. huge
# vocabularies) the heavy-row shuffle path is used: it streams and never
# requires any single object to hold the corpus.
# Default cap 1.25 GiB: ~1 GB of broadcast state per node is routine on
# 100-GB-class hosts (it is fetched once per NODE, not per task), and the
# alternative heavy-row sort shuffle costs ~#buckets-fold payload
# duplication — measured on a 160-replica scaling corpus (~117 M token
# occurrences, est ~1.05 GiB): broadcast-mode wall 80-100 s at 32 CPUs vs
# the heavy-row path thrashing the single-node object store (>8 min, 80%
# system CPU). Tune DOWN via RAYSSJ_BCAST_RANKS_MAX on small-memory nodes.
_BCAST_RANKS_MAX_BYTES = int(os.environ.get("RAYSSJ_BCAST_RANKS_MAX",
                                            str(1280 * 1024 * 1024)))


def _ranks_bcast_estimate(order) -> int | None:
    """Estimated broadcast-table bytes, or None when unknowable cheaply
    (distributed ordering keeps no driver-side counts)."""
    counts = getattr(order, "counts", None)
    if counts is None:
        return None
    width = 2 if len(order) < 65536 else 4
    occ = int(counts.sum())
    # + ~24B/record for hash + offset + length; every record has >= 1 token
    return occ * (width + 1) + 24 * max(occ // 4, 1)


def _encode_ranks_fn(order_ref, rank_np):
    def fn(batch: pa.Table) -> pa.Table:
        order = _cached_order(order_ref)
        rv, _, lengths = order.encode(batch[TOKENS_COL])
        offs = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offs[1:])
        ranks = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()), pa.array(rv.astype(rank_np)))
        return pa.table({"key": batch["key"], "ranks": ranks})

    return fn


def _encoded_block_refs(clean_ds, fn):
    """Materialize one encoded broadcast side and return its BLOCK REFS —
    the data stays in the object store; the driver holds only refs
    (VERDICT r03 next #8: driver RSS stays flat even at the broadcast cap)."""
    mat = clean_ds.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    return list(mat.to_arrow_refs())


def _ranks_side_from_tables(tbls, rank_np):
    """(sorted key-hash lookup dict, flat rank values) for one side, from the
    encoded per-block tables; (None, None) on a 62-bit hash collision."""
    # map_batches SKIPS empty blocks, so an empty pandas-backed source block
    # can reach here unconverted — drop empties by len() and coerce stragglers
    tbls = [t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
            for t in tbls if len(t)]
    if not tbls:
        z = np.array([], dtype=np.int64)
        return {"h": z, "st": z, "ln": z}, np.array([], dtype=rank_np)
    tbl = pa.concat_tables(tbls)
    keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
    kh = _key_hash(keys)
    ranks = tbl["ranks"].combine_chunks() if isinstance(tbl["ranks"], pa.ChunkedArray) else tbl["ranks"]
    rv = ranks.flatten().to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(ranks).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    sortix = np.argsort(kh, kind="stable")
    h = kh[sortix]
    if len(h) > 1 and (h[1:] == h[:-1]).any():
        return None, None  # 62-bit hash collision — caller falls back
    return {"h": h, "st": offs[:-1][sortix], "ln": lens[sortix]}, rv


def _distinct_sorted_lists(rv, lengths):
    """Dedup each row's slice of a flat rank-sorted bag. Returns
    (values, offsets) of the distinct sorted lists."""
    n = len(lengths)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    all_rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
    dup = np.zeros(len(rv), dtype=bool)
    dup[1:] = (all_rows[1:] == all_rows[:-1]) & (rv[1:] == rv[:-1])
    g_rows = all_rows[~dup]
    g_vals = rv[~dup]
    g_counts = np.bincount(g_rows, minlength=n)
    g_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(g_counts, out=g_off[1:])
    return g_vals, g_off, g_counts


@ray.remote(num_returns=2)
def _assemble_ranks_bcast(refs0, refs1, rank_np):
    """Worker-side broadcast-table assembly: the ≤ RAYSSJ_BCAST_RANKS_MAX
    concat + hash-sort runs in ONE Ray task and the table ships back as a
    task RETURN (owned by the driver process but stored in the object store),
    so the driver never holds the encoded ranks (VERDICT r03 next #8).
    Returns (ok, table): ok=False signals a key-hash collision — the caller
    falls back to the heavy-row shuffle path."""
    s0, rv0 = _ranks_side_from_tables(ray.get(refs0), rank_np)
    if s0 is None:
        return False, None
    if refs1 is None:
        return True, {"s0": s0, "s1": None, "rv": rv0}
    s1, rv1 = _ranks_side_from_tables(ray.get(refs1), rank_np)
    if s1 is None:
        return False, None
    # one flat values array serves both sides: side-1 slices are offset past
    # side-0's values
    s1 = {"h": s1["h"], "st": s1["st"] + len(rv0), "ln": s1["ln"]}
    return True, {"s0": s0, "s1": s1,
                  "rv": np.concatenate([rv0, rv1]) if len(rv1) else rv0}


def _encode_ed_fn(order_ref):
    """(key, grams: distinct sorted gram ranks, s) per record — the
    edit-distance broadcast payload."""

    def fn(batch: pa.Table) -> pa.Table:
        order = _cached_order(order_ref)
        rv, _, lengths = order.encode(batch[TOKENS_COL])
        g_vals, g_off, _ = _distinct_sorted_lists(rv, lengths)
        grams = pa.LargeListArray.from_arrays(
            pa.array(g_off, type=pa.int64()),
            pa.array(g_vals.astype(np.int32), type=pa.int32()))
        return pa.table({"key": batch["key"], "ranks": grams,
                         "s": batch["s"]})

    return fn


def _ed_side_from_tables(tbls):
    """ED broadcast side: sorted key-hashes, gram slices, strings (aligned to
    the hash order); (None, None, None) on a hash collision."""
    tbls = [t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
            for t in tbls if len(t)]
    if not tbls:
        z = np.array([], dtype=np.int64)
        return {"h": z, "st": z, "ln": z, "sbase": 0}, \
            np.array([], dtype=np.int32), pa.array([], type=pa.string())
    tbl = pa.concat_tables(tbls)
    keys = tbl["key"].combine_chunks() if isinstance(tbl["key"], pa.ChunkedArray) else tbl["key"]
    kh = _key_hash(keys)
    ranks = tbl["ranks"].combine_chunks() if isinstance(tbl["ranks"], pa.ChunkedArray) else tbl["ranks"]
    rv = ranks.flatten().to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(ranks).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    sortix = np.argsort(kh, kind="stable")
    h = kh[sortix]
    if len(h) > 1 and (h[1:] == h[:-1]).any():
        return None, None, None
    strs = tbl["s"].combine_chunks() if isinstance(tbl["s"], pa.ChunkedArray) else tbl["s"]
    strs = strs.take(pa.array(sortix, type=pa.int64()))
    return {"h": h, "st": offs[:-1][sortix], "ln": lens[sortix],
            "sbase": 0}, rv, strs


@ray.remote(num_returns=2)
def _assemble_ed_bcast(refs0, refs1):
    """Worker-side ED broadcast assembly (same shape as
    ``_assemble_ranks_bcast``: one task builds, the driver holds only the
    returned ref). Returns (ok, table)."""
    s0, rv0, strs0 = _ed_side_from_tables(ray.get(refs0))
    if s0 is None:
        return False, None
    if refs1 is None:
        return True, {"s0": s0, "s1": None, "rv": rv0, "strs": strs0}
    s1, rv1, strs1 = _ed_side_from_tables(ray.get(refs1))
    if s1 is None:
        return False, None
    s1 = {"h": s1["h"], "st": s1["st"] + len(rv0), "ln": s1["ln"],
          "sbase": len(strs0)}
    strs = pa.concat_arrays([strs0, strs1]) if len(strs1) else strs0
    rv = np.concatenate([rv0, rv1]) if len(rv1) else rv0
    return True, {"s0": s0, "s1": s1, "rv": rv, "strs": strs}


def _build_ed_broadcast(l_clean, r_clean, order_ref, self_join):
    """Ref to the ED gram/string table, or None on hash collision. The
    table is assembled worker-side; the driver only routes block refs."""
    refs0 = _encoded_block_refs(l_clean, _encode_ed_fn(order_ref))
    refs1 = None if self_join else _encoded_block_refs(
        r_clean, _encode_ed_fn(order_ref))
    ok_ref, tbl_ref = _assemble_ed_bcast.remote(refs0, refs1)
    return tbl_ref if ray.get(ok_ref) else None


def _build_ranks_broadcast(l_clean, r_clean, order_ref, self_join, rank_np):
    """Ref to one rank table for the kernels, or None on hash collision. The
    table is assembled worker-side; the driver only routes block refs."""
    refs0 = _encoded_block_refs(l_clean, _encode_ranks_fn(order_ref, rank_np))
    refs1 = None if self_join else _encoded_block_refs(
        r_clean, _encode_ranks_fn(order_ref, rank_np))
    ok_ref, tbl_ref = _assemble_ranks_bcast.remote(refs0, refs1, rank_np)
    return tbl_ref if ray.get(ok_ref) else None


class _SetSimExploder:
    """Actor-pool stage: rank-encode token lists and explode prefix tokens
    into salted grid cells.

    Holds the broadcast rank index (loaded ONCE per actor in __init__, per the
    stateful-stage rule); per batch emits one row per (record, prefix token,
    grid cell).
    """

    def __init__(self, order_ref, sim_measure_type, threshold, side, num_buckets,
                 self_mode=False, salt_target=None, emit_heavy=True):
        self.order = ray.get(order_ref) if isinstance(order_ref, ray.ObjectRef) else order_ref
        self.measure = sim_measure_type
        self.threshold = threshold
        self.side = side
        self.num_buckets = num_buckets
        self.self_mode = self_mode
        self.salt_target = salt_target
        # emit_heavy=False (broadcast-ranks mode): the kernel reads rank
        # arrays from a ray.put table instead of shuffled HEAVY rows, so the
        # explode emits ONLY light rows and drops the ranks column — the
        # dominant shuffle payload (ranks shipped once per (record, bucket))
        # disappears entirely
        self.emit_heavy = emit_heavy
        # heavy rank payloads dominate the bucket-shuffle bytes; when the
        # vocabulary fits, ship them as uint16 (half of int32) — the kernel's
        # numpy ops are dtype-agnostic (sentinels live in separate int64
        # arrays, mixed comparisons promote)
        self.rank_type = pa.uint16() if len(self.order) < 65536 else pa.int32()
        self.rank_np = np.uint16 if len(self.order) < 65536 else np.int32

    def __call__(self, batch: pa.Table) -> pa.Table:
        order = self.order
        rv, cv, lengths = order.encode(batch[TOKENS_COL])
        n = len(lengths)
        sizes = lengths.astype(np.int64)
        pl = fu.get_prefix_length(sizes, self.measure, self.threshold)
        pl = np.minimum(pl, sizes)
        # OVERLAP_COEFFICIENT: only the SMALLER record's prefix is guaranteed
        # to intersect the other's FULL token set (unbounded size ratio), so
        # emit every token; the bucket kernel applies the true-prefix rule on
        # the smaller side (see make_set_sim_bucket_kernel).
        emit_len = sizes if self.measure == fu.OVERLAP_COEFFICIENT else pl
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        row_ids = np.repeat(np.arange(n, dtype=np.int64), emit_len)
        total = int(emit_len.sum())
        keys = batch["key"].combine_chunks() if isinstance(batch["key"], pa.ChunkedArray) else batch["key"]
        if total == 0:
            return _empty_exploded(keys.type, self.rank_type, self.emit_heavy)
        first = np.zeros(n, dtype=np.int64)
        np.cumsum(emit_len[:-1], out=first[1:])
        pos = np.arange(total, dtype=np.int64) - first[row_ids]
        ptok = rv[offsets[row_ids] + pos]
        pdf = cv[offsets[row_ids] + pos]

        keyhash = _key_hash(keys)
        rep, grp, out_side = _salt_cells(ptok, row_ids, keyhash, pdf,
                                         self.side, self.self_mode,
                                         self.salt_target)
        tgt = self.salt_target or SALT_TARGET
        s = np.clip((pdf + tgt - 1) // tgt, 1, SALT_MAX)
        cell_rows = np.maximum(pdf // s, 1)
        bucket = _load_ordered_bucket(grp, self.num_buckets, cell_rows[rep])
        rec_of = row_ids[rep]
        light_cols = {
            "grp": pa.array(grp),
            "ptok": pa.array(ptok[rep]),
            "pos": pa.array(pos[rep].astype(np.int32)),
            "side": pa.array(out_side),
            "key": keys.take(pa.array(rec_of, type=pa.int64())),
            "size": pa.array(sizes[rec_of].astype(np.int32)),
            "pl": pa.array(pl[rec_of].astype(np.int32)),
            "bucket": pa.array(bucket),
        }
        if not self.emit_heavy:
            return pa.table(light_cols)
        ranks_list = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(rv.astype(self.rank_np), type=self.rank_type))
        # LIGHT rows drive pair generation (no rank payload); the rank arrays
        # travel as HEAVY rows (side = -1) exactly ONCE per (record, bucket) —
        # instead of once per (record, prefix token, grid cell). On long token
        # sets this shrinks the shuffle several-fold.
        hb = np.unique(np.stack([rec_of, bucket]), axis=1)
        h_rows, h_bucket = hb[0], hb[1]
        light_cols["ranks"] = pa.nulls(len(rep), type=pa.large_list(self.rank_type))
        light = pa.table({k: light_cols[k] for k in _EXPL_COLS})
        heavy_side = -1 if self.self_mode else (-1 - self.side)
        heavy = pa.table({
            "grp": pa.array(np.full(len(h_rows), -1, dtype=np.int64)),
            "ptok": pa.array(np.full(len(h_rows), -1, dtype=np.int64)),
            "pos": pa.array(np.full(len(h_rows), -1, dtype=np.int32)),
            "side": pa.array(np.full(len(h_rows), heavy_side, dtype=np.int8)),
            "key": keys.take(pa.array(h_rows, type=pa.int64())),
            "size": pa.array(sizes[h_rows].astype(np.int32)),
            "pl": pa.array(pl[h_rows].astype(np.int32)),
            "ranks": ranks_list.take(pa.array(h_rows, type=pa.int64())),
            "bucket": pa.array(h_bucket),
        })
        return pa.concat_tables([light, heavy])


_EXPL_COLS = ("grp", "ptok", "pos", "side", "key", "size", "pl", "ranks",
              "bucket")


def _empty_exploded(key_type, rank_type=None, emit_heavy=True):
    cols = {
        "grp": pa.array([], type=pa.int64()),
        "ptok": pa.array([], type=pa.int64()),
        "pos": pa.array([], type=pa.int32()),
        "side": pa.array([], type=pa.int8()),
        "key": pa.array([], type=key_type),
        "size": pa.array([], type=pa.int32()),
        "pl": pa.array([], type=pa.int32()),
        "ranks": pa.array([], type=pa.large_list(rank_type or pa.int32())),
        "bucket": pa.array([], type=pa.int64()),
    }
    if not emit_heavy:
        cols.pop("ranks")
    return pa.table(cols)


class _EditDistExploder:
    """Explode distinct ordered-prefix q-grams for the edit-distance join."""

    def __init__(self, order_ref, qval, threshold, side, num_buckets,
                 self_mode=False, salt_target=None, emit_heavy=True):
        self.order = ray.get(order_ref) if isinstance(order_ref, ray.ObjectRef) else order_ref
        self.qval = qval
        self.threshold = threshold
        self.side = side
        self.num_buckets = num_buckets
        self.self_mode = self_mode
        self.salt_target = salt_target
        # emit_heavy=False (broadcast mode): grams + string travel once via
        # ray.put instead of once per (record, prefix gram, cell) row
        self.emit_heavy = emit_heavy

    def __call__(self, batch: pa.Table) -> pa.Table:
        order = self.order
        rv, cv, lengths = order.encode(batch[TOKENS_COL])  # bag, sorted by rank
        n = len(lengths)
        pl = np.minimum(int(self.qval * self.threshold + 1), lengths).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        strs = batch["s"].combine_chunks() if isinstance(batch["s"], pa.ChunkedArray) else batch["s"]
        slens = pc.utf8_length(strs).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = batch["key"].combine_chunks() if isinstance(batch["key"], pa.ChunkedArray) else batch["key"]
        if n == 0 or int(pl.sum()) == 0:
            return _empty_ed_exploded(keys.type, self.emit_heavy)

        # distinct full-gram set per row (dedup the sorted bag)
        g_vals, g_off, g_counts = _distinct_sorted_lists(rv, lengths)
        if self.emit_heavy:
            grams_list = pa.ListArray.from_arrays(
                pa.array(g_off, type=pa.int64()), pa.array(g_vals, type=pa.int64()),
            ).cast(pa.large_list(pa.int64()))

        # distinct PREFIX ranks per row (prefix slice of the sorted bag)
        first = np.zeros(n, dtype=np.int64)
        np.cumsum(pl[:-1], out=first[1:])
        row_ids_all = np.repeat(np.arange(n, dtype=np.int64), pl)
        within = np.arange(len(row_ids_all), dtype=np.int64) - first[row_ids_all]
        pref_vals = rv[offsets[row_ids_all] + within]
        pref_cnts = cv[offsets[row_ids_all] + within]
        keep = np.ones(len(pref_vals), dtype=bool)
        keep[1:] = (row_ids_all[1:] != row_ids_all[:-1]) | (pref_vals[1:] != pref_vals[:-1])
        row_ids = row_ids_all[keep]
        ptok = pref_vals[keep]
        pdf = pref_cnts[keep]
        dcounts = np.bincount(row_ids, minlength=n)
        doffsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(dcounts, out=doffsets[1:])
        pref_list = pa.ListArray.from_arrays(
            pa.array(doffsets, type=pa.int64()), pa.array(ptok, type=pa.int64()),
        ).cast(pa.large_list(pa.int64()))
        keyhash = _key_hash(keys)
        # counts for the ED bag ordering are occurrence counts; salting still
        # wants record-df — occurrence counts over-estimate df, which only
        # over-salts (harmless)
        rep, grp, out_side = _salt_cells(ptok, row_ids, keyhash, pdf,
                                         self.side, self.self_mode,
                                         self.salt_target)
        tgt = self.salt_target or SALT_TARGET
        s = np.clip((pdf + tgt - 1) // tgt, 1, SALT_MAX)
        cell_rows = np.maximum(pdf // s, 1)
        take_idx = pa.array(row_ids[rep], type=pa.int64())
        cols = {
            "grp": pa.array(grp),
            "ptok": pa.array(ptok[rep]),
            "side": pa.array(out_side),
            "key": keys.take(take_idx),
            "slen": pa.array(slens[row_ids][rep].astype(np.int32)),
            "dsize": pa.array(g_counts[row_ids][rep].astype(np.int32)),
            "ranks": pref_list.take(take_idx),
            "bucket": pa.array(_load_ordered_bucket(grp, self.num_buckets,
                                                    cell_rows[rep])),
        }
        if self.emit_heavy:
            cols["grams"] = grams_list.take(take_idx)
            cols["s"] = strs.take(take_idx)
            cols = {k: cols[k] for k in _ED_EXPL_COLS}
        return pa.table(cols)


_ED_EXPL_COLS = ("grp", "ptok", "side", "key", "slen", "dsize", "ranks",
                 "grams", "s", "bucket")


def _empty_ed_exploded(key_type, emit_heavy=True):
    cols = {
        "grp": pa.array([], type=pa.int64()),
        "ptok": pa.array([], type=pa.int64()),
        "side": pa.array([], type=pa.int8()),
        "key": pa.array([], type=key_type),
        "slen": pa.array([], type=pa.int32()),
        "dsize": pa.array([], type=pa.int32()),
        "ranks": pa.array([], type=pa.large_list(pa.int64())),
        "grams": pa.array([], type=pa.large_list(pa.int64())),
        "s": pa.array([], type=pa.string()),
        "bucket": pa.array([], type=pa.int64()),
    }
    if not emit_heavy:
        cols.pop("grams")
        cols.pop("s")
    return pa.table(cols)


def _empty_token_keys(tok_ds):
    """Keys of rows whose (non-null) token set is empty — the allow_empty side
    path; expected rare, collected to the driver (bounded; SURVEY.md §7.4)."""
    def fn(t: pa.Table) -> pa.Table:
        lens = pc.list_value_length(t[TOKENS_COL])
        mask = pc.and_(pc.is_valid(t[TOKENS_COL]), pc.equal(lens, 0))
        return t.filter(mask).select(["key"])

    return [r["key"] for r in
            tok_ds.map_batches(fn, batch_format="pyarrow").take_all()]


def _missing_keys(tok_ds):
    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t[TOKENS_COL])).select(["key"])

    return [r["key"] for r in
            tok_ds.map_batches(fn, batch_format="pyarrow").take_all()]


def _pairs_table(l_keys, r_keys, scores) -> pa.Table:
    return pa.table({"l_key": pa.array(l_keys), "r_key": pa.array(r_keys),
                     "_sim_score": pa.array(scores, type=pa.float64())})




def _drop_if_present(ds, cols):
    """Tolerant column drop (Dataset.join drops the right key itself when the
    names differ; don't fail when it already did)."""

    def fn(t: pa.Table) -> pa.Table:
        present = [c for c in cols if c in t.schema.names]
        return t.drop_columns(present) if present else t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

def _rename_ds(ds, mapping: dict):
    """rename via an Arrow map_batches (Dataset.rename_columns chokes on
    pandas-backed blocks in Ray 2.49)."""
    if not mapping:
        return ds

    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.schema.names])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

def _shape_output(pairs_ds, l_ds, r_ds, l_key_attr, r_key_attr,
                  l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix,
                  out_sim_score, num_buckets):
    """Rename key cols, hash-join out-attrs back by key, order columns."""
    l_key_col = l_out_prefix + l_key_attr
    r_key_col = r_out_prefix + r_key_attr
    pairs_ds = _rename_ds(pairs_ds, {"l_key": l_key_col, "r_key": r_key_col})

    def attach(ds, src, key_attr, out_attrs, prefix, key_col):
        if not out_attrs:
            return ds
        side = src.select_columns([key_attr] + list(out_attrs))
        renames = {a: prefix + a for a in out_attrs}
        renames[key_attr] = "__join_key"
        side = _rename_ds(side, renames)
        joined = hash_join(ds, side, on=(key_col,), right_on=("__join_key",))
        return _drop_if_present(joined, ["__join_key"])

    pairs_ds = attach(pairs_ds, l_ds, l_key_attr, l_out_attrs, l_out_prefix, l_key_col)
    pairs_ds = attach(pairs_ds, r_ds, r_key_attr, r_out_attrs, r_out_prefix, r_key_col)

    cols = [l_key_col, r_key_col]
    cols += [l_out_prefix + a for a in (l_out_attrs or [])]
    cols += [r_out_prefix + a for a in (r_out_attrs or [])]
    if out_sim_score:
        cols.append("_sim_score")
        return pairs_ds.select_columns(cols)
    return pairs_ds.select_columns(cols)


def _set_sim_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr,
                  tokenizer, sim_measure_type, threshold, comp_op=">=",
                  allow_empty=True, allow_missing=False,
                  l_out_attrs=None, r_out_attrs=None,
                  l_out_prefix="l_", r_out_prefix="r_",
                  out_sim_score=True, n_jobs=1, show_progress=False,
                  self_join=False, num_buckets=None,
                  token_order=None, bucket_range=None, salt_target=None,
                  out_id=False, prebuilt_exploded=None, ranks_bcast=None):
    """``token_order``/``bucket_range`` support partitioned-resumable runs
    (rayssj.pipelines): pass a precomputed TokenOrder and restrict the kernel
    stage to buckets in [lo, hi) so each bucket range is an independently
    restartable output partition. ``prebuilt_exploded`` (with ``token_order``)
    reuses one materialized explode across every bucket-range partition
    instead of re-tokenizing + re-exploding the full input per partition
    (see build_set_sim_exploded)."""
    import ray.data as rd

    auto_buckets = num_buckets is None
    if auto_buckets:
        num_buckets = default_num_buckets()
    # validate on the RAW datasets: repartition of an empty dataset loses the
    # schema (Dataset.schema() -> None), which would break attr validation
    l_raw = _as_dataset(ltable)
    r_raw = l_raw if self_join else _as_dataset(rtable)
    validate_join_inputs(l_raw, r_raw, l_key_attr, r_key_attr, l_join_attr,
                         r_join_attr, tokenizer, threshold, comp_op,
                         sim_measure_type, l_out_attrs, r_out_attrs)
    l_ds = _ensure_parallel(l_raw)
    r_ds = l_ds if self_join else _ensure_parallel(r_raw)
    if _probe_empty(l_raw) or (not self_join and _probe_empty(r_raw)):
        from rayssj.validation import _schema_of

        return _empty_pairs_output(_schema_of(l_raw), _schema_of(r_raw),
                                   l_key_attr, r_key_attr, l_out_attrs,
                                   r_out_attrs, l_out_prefix, r_out_prefix,
                                   out_sim_score)
    tk = _clone_tokenizer(tokenizer, return_set=True)

    if prebuilt_exploded is not None:
        assert token_order is not None, \
            "prebuilt_exploded requires the matching token_order"
        order = token_order
        exploded = prebuilt_exploded
        # the side paths below rebuild these lazily only if needed
        l_tok = r_tok = l_clean = r_clean = None
    else:
        l_tok = _maybe_cache(_tokenize_stage(l_ds, l_key_attr, l_join_attr, tk, keep_string=False), l_ds)
        r_tok = l_tok if self_join else _maybe_cache(_tokenize_stage(r_ds, r_key_attr, r_join_attr, tk, keep_string=False), r_ds)
        l_clean = _drop_missing(l_tok)
        r_clean = l_clean if self_join else _drop_missing(r_tok)

        # ordering over the PRE-drop datasets: null rows add no tokens to the
        # counts but ARE counted for the allow_missing side path
        if token_order is not None:
            order = token_order
        elif self_join:
            order = build_token_order(l_tok)
        else:
            order = build_token_order(l_tok, r_tok)
        order_ref = ray.put(order)

        est = _ranks_bcast_estimate(order)
        if est is not None and est <= _BCAST_RANKS_MAX_BYTES:
            rank_np = np.uint16 if len(order) < 65536 else np.int32
            ranks_bcast = _build_ranks_broadcast(l_clean, r_clean, order_ref,
                                                 self_join, rank_np)
        if ranks_bcast is not None and auto_buckets:
            num_buckets = bcast_num_buckets(order)

        expl_kwargs = dict(sim_measure_type=sim_measure_type, threshold=threshold,
                           num_buckets=num_buckets, self_mode=self_join,
                           salt_target=salt_target,
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

    if bucket_range is not None:
        lo, hi = bucket_range
        exploded = exploded.map_batches(
            lambda t, lo=lo, hi=hi: t.filter(
                pc.and_(pc.greater_equal(t["bucket"], lo),
                        pc.less(t["bucket"], hi))),
            batch_format="pyarrow", zero_copy_batch=True)

    kernel = make_set_sim_bucket_kernel(sim_measure_type, threshold, comp_op,
                                        self_join=self_join,
                                        ranks_ref=ranks_bcast)
    pairs = _bucket_groupby(exploded).map_groups(kernel, batch_format="pyarrow")

    extra = []
    comp_fn = fu.COMP_OP_MAP[comp_op]
    first_range = bucket_range is None or bucket_range[0] == 0
    needs_side_paths = (
        (allow_empty and comp_fn(1.0, threshold) and order.n_empty > 0 and first_range)
        or (allow_missing and order.n_missing > 0 and first_range))
    if l_clean is None and needs_side_paths:
        # prebuilt-exploded run that still needs the bounded empty/missing
        # side passes: rebuild the (cheap) tokenized views on demand
        l_tok = _maybe_cache(_tokenize_stage(l_ds, l_key_attr, l_join_attr, tk, keep_string=False), l_ds)
        r_tok = l_tok if self_join else _maybe_cache(_tokenize_stage(r_ds, r_key_attr, r_join_attr, tk, keep_string=False), r_ds)
        l_clean = _drop_missing(l_tok)
        r_clean = l_clean if self_join else _drop_missing(r_tok)
    if allow_empty and comp_fn(1.0, threshold) and order.n_empty > 0 and first_range:
        l_empty = _empty_token_keys(l_clean)
        r_empty = l_empty if self_join else _empty_token_keys(r_clean)
        ek_l, ek_r = [], []
        if self_join:
            for i, a in enumerate(l_empty):
                for b in l_empty[i + 1:]:
                    lo, hi = (a, b) if a <= b else (b, a)
                    ek_l.append(lo)
                    ek_r.append(hi)
        else:
            for a in l_empty:
                for b in r_empty:
                    ek_l.append(a)
                    ek_r.append(b)
        if ek_l:
            extra.append(_pairs_table(ek_l, ek_r, [1.0] * len(ek_l)))
    for tbl in extra:
        pairs = pairs.union(rd.from_arrow(tbl))
    if allow_missing and order.n_missing > 0 and first_range:
        for mds in _missing_pair_datasets(l_clean, l_tok, r_tok, self_join):
            pairs = pairs.union(mds)

    out = _shape_output(pairs, l_ds, r_ds, l_key_attr, r_key_attr,
                        l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix,
                        out_sim_score, num_buckets)
    if out_id:  # reference-shaped output leads with a dense _id column
        from rayssj.converter import add_dense_id

        out = add_dense_id(out)
    return out


def build_set_sim_exploded(ltable, key_attr, join_attr, tokenizer,
                           sim_measure_type, threshold, num_buckets,
                           token_order, salt_target=None):
    """Materialize the self-join explode ONCE for reuse across bucket-range
    partitions (pass as ``_set_sim_join(prebuilt_exploded=...)``): a
    partitioned-resumable linkage run otherwise re-tokenizes and re-explodes
    the full input per partition and discards all but 1/pair_partitions of
    the rows (round-1 VERDICT pipeline audit).

    Returns ``(exploded, ranks_bcast)`` — pass BOTH through to
    ``_set_sim_join(prebuilt_exploded=..., ranks_bcast=...)`` so the kernel
    stage matches the explode's heavy/broadcast mode."""
    l_ds = _ensure_parallel(_as_dataset(ltable))
    tk = _clone_tokenizer(tokenizer, return_set=True)
    l_tok = _maybe_cache(_tokenize_stage(l_ds, key_attr, join_attr, tk,
                                         keep_string=False), l_ds)
    l_clean = _drop_missing(l_tok)
    order_ref = ray.put(token_order)
    ranks_bcast = None
    est = _ranks_bcast_estimate(token_order)
    if est is not None and est <= _BCAST_RANKS_MAX_BYTES:
        rank_np = np.uint16 if len(token_order) < 65536 else np.int32
        ranks_bcast = _build_ranks_broadcast(l_clean, None, order_ref, True,
                                             rank_np)
    expl_kwargs = dict(sim_measure_type=sim_measure_type, threshold=threshold,
                       num_buckets=num_buckets, self_mode=True,
                       salt_target=salt_target,
                       emit_heavy=ranks_bcast is None)
    exploded = l_clean.map_batches(
        make_explode_fn(_SetSimExploder, order_ref, side=0, **expl_kwargs),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    return exploded, ranks_bcast


def _missing_pair_datasets(l_clean, l_tok, r_tok, self_join):
    """allow_missing: (missing_l × all_r) ∪ (nonmissing_l × missing_r), NaN
    scores [ref: utils/missing_value_handler.py:~15 †U]. Only the MISSING key
    lists are driver-held (the bounded side, SURVEY.md §7.4); the "all" /
    "nonmissing" sides STREAM — each output batch is a broadcast-fixed ×
    streamed-batch cross product, so a few missing rows against a billion-row
    table never materialize on the driver."""
    l_missing = _missing_keys(l_tok)
    r_missing = l_missing if self_join else _missing_keys(r_tok)
    outs = []
    if not l_missing and not r_missing:
        return outs

    def cross(fixed_keys, stream_ds, fixed_on_left):
        fixed_arr = pa.array(fixed_keys)

        def fn(t: pa.Table) -> pa.Table:
            ks = t["key"].combine_chunks() if isinstance(t["key"], pa.ChunkedArray) else t["key"]
            m, n = len(fixed_arr), len(ks)
            f = fixed_arr.take(pa.array(np.repeat(np.arange(m, dtype=np.int64), n)))
            s = ks.take(pa.array(np.tile(np.arange(n, dtype=np.int64), m)))
            lk, rk = (f, s) if fixed_on_left else (s, f)
            return pa.table({"l_key": lk, "r_key": rk,
                             "_sim_score": pa.array(
                                 np.full(m * n, np.nan), type=pa.float64())})

        # trailing scrub (explicit batch_size) drops empty pass-through
        # blocks whose schema would still be ("key",)
        return (stream_ds.select_columns(["key"])
                .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
                .map_batches(lambda t: t, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=1 << 18))

    if l_missing:
        outs.append(cross(l_missing, l_tok if self_join else r_tok, True))
    if r_missing:
        outs.append(cross(r_missing, l_clean, False))
    return outs


def jaccard_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr,
                 tokenizer, threshold, **kwargs):
    """Jaccard set-similarity join [ref: join/jaccard_join.py:~20 †U].

    API divergences from the reference (apply to every join/filter here):
    ``n_jobs`` and ``show_progress`` are accepted for signature compatibility
    but INERT — parallelism is Ray's streaming scheduler (size it via
    ``ray.init(num_cpus=...)`` / per-stage ``num_buckets``), and progress is
    Ray Data's own reporting. The reference's dense 0..n-1 ``_id`` output
    column is OPT-IN via ``out_id=True`` (a distributed zip-with-index pass;
    values are stable within a run but their assignment to rows is
    scheduling-order dependent, hence not reproducible across runs —
    SURVEY.md §7.4).
    """
    return _set_sim_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr,
                         r_join_attr, tokenizer, fu.JACCARD, threshold, **kwargs)


def cosine_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr,
                tokenizer, threshold, **kwargs):
    """Set-cosine (Ochiai) similarity join [ref: join/cosine_join.py:~20 †U]."""
    return _set_sim_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr,
                         r_join_attr, tokenizer, fu.COSINE, threshold, **kwargs)


def dice_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr,
              tokenizer, threshold, **kwargs):
    """Dice similarity join [ref: join/dice_join.py:~20 †U]."""
    return _set_sim_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr,
                         r_join_attr, tokenizer, fu.DICE, threshold, **kwargs)


def overlap_coefficient_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr,
                             r_join_attr, tokenizer, threshold, **kwargs):
    """Overlap-coefficient join [ref: join/overlap_coefficient_join.py:~20 †U]."""
    return _set_sim_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr,
                         r_join_attr, tokenizer, fu.OVERLAP_COEFFICIENT, threshold,
                         **kwargs)


def overlap_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr,
                 tokenizer, threshold, **kwargs):
    """Overlap (shared distinct token count) join [ref: join/overlap_join.py:~20 †U]."""
    kwargs.setdefault("allow_empty", False)
    return _set_sim_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr,
                         r_join_attr, tokenizer, fu.OVERLAP, threshold, **kwargs)


def edit_distance_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr,
                       r_join_attr, tokenizer, threshold, comp_op="<=",
                       allow_missing=False, l_out_attrs=None, r_out_attrs=None,
                       l_out_prefix="l_", r_out_prefix="r_", out_sim_score=True,
                       n_jobs=1, show_progress=False, self_join=False,
                       num_buckets=None, salt_target=None,
                       out_id=False):
    """Edit-distance join [ref: join/edit_distance_join.py:~25 †U].

    Blocking on ordered q-gram-bag prefixes (length q·t+1); verification is
    character-level Levenshtein, vectorized ACROSS candidate pairs.
    """
    import ray.data as rd

    auto_buckets = num_buckets is None
    if auto_buckets:
        num_buckets = default_num_buckets()
    l_raw = _as_dataset(ltable)
    r_raw = l_raw if self_join else _as_dataset(rtable)
    validate_join_inputs(l_raw, r_raw, l_key_attr, r_key_attr, l_join_attr,
                         r_join_attr, tokenizer, threshold, comp_op,
                         fu.EDIT_DISTANCE, l_out_attrs, r_out_attrs)
    l_ds = _ensure_parallel(l_raw)
    r_ds = l_ds if self_join else _ensure_parallel(r_raw)
    if _probe_empty(l_raw) or (not self_join and _probe_empty(r_raw)):
        from rayssj.validation import _schema_of

        return _empty_pairs_output(_schema_of(l_raw), _schema_of(r_raw),
                                   l_key_attr, r_key_attr, l_out_attrs,
                                   r_out_attrs, l_out_prefix, r_out_prefix,
                                   out_sim_score)
    tk = _clone_tokenizer(tokenizer, return_set=False)

    l_tok = _maybe_cache(_tokenize_stage(l_ds, l_key_attr, l_join_attr, tk, keep_string=True), l_ds)
    r_tok = l_tok if self_join else _maybe_cache(_tokenize_stage(r_ds, r_key_attr, r_join_attr, tk, keep_string=True), r_ds)
    l_clean = _drop_missing(l_tok)
    r_clean = l_clean if self_join else _drop_missing(r_tok)

    order = build_token_order(l_tok) if self_join else build_token_order(l_tok, r_tok)
    order_ref = ray.put(order)

    ranks_bcast = None
    est = _ranks_bcast_estimate(order)
    if est is not None and est * 3 <= _BCAST_RANKS_MAX_BYTES:
        # x3: the ED broadcast also carries the raw strings
        ranks_bcast = _build_ed_broadcast(l_clean, r_clean, order_ref,
                                          self_join)
    if ranks_bcast is not None and auto_buckets:
        num_buckets = bcast_num_buckets(order)

    expl_kwargs = dict(qval=tk.qval, threshold=threshold, num_buckets=num_buckets,
                       self_mode=self_join, salt_target=salt_target,
                       emit_heavy=ranks_bcast is None)
    l_expl = l_clean.map_batches(
        make_explode_fn(_EditDistExploder, order_ref, side=0, **expl_kwargs),
        batch_format="pyarrow", zero_copy_batch=True)
    if self_join:
        exploded = l_expl
    else:
        r_expl = r_clean.map_batches(
            make_explode_fn(_EditDistExploder, order_ref, side=1, **expl_kwargs),
            batch_format="pyarrow", zero_copy_batch=True)
        exploded = l_expl.union(r_expl)

    kernel = make_edit_distance_bucket_kernel(threshold, comp_op, self_join=self_join, qval=tk.qval,
                                              ranks_ref=ranks_bcast)
    pairs = _bucket_groupby(exploded).map_groups(kernel, batch_format="pyarrow")

    if allow_missing and order.n_missing > 0:
        for mds in _missing_pair_datasets(l_clean, l_tok, r_tok, self_join):
            pairs = pairs.union(mds)

    out = _shape_output(pairs, l_ds, r_ds, l_key_attr, r_key_attr,
                        l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix,
                        out_sim_score, num_buckets)
    if out_id:
        from rayssj.converter import add_dense_id

        out = add_dense_id(out)
    return out
