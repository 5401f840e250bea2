"""Distributed transitive-closure clustering of match pairs (north_star stage;
not in the reference — SURVEY.md §2 'Not present' list).

connected_components(pairs_ds, l_col, r_col) → Dataset(node, component).

Two regimes, both built on one vectorized numpy min-label kernel:

- **Driver fast path** (edge list ≤ ``driver_threshold``, default 2 M edges):
  Arrow-native block fetch → sorted-unique node index → presorted
  ``minimum.reduceat`` min-label sweeps with pointer jumping — skips the
  shuffle round-trip entirely for small match graphs.

- **Distributed contraction** (above the cap): iterative LOCAL contraction —
  hash-partition edges by endpoint, run the same numpy kernel per partition,
  emit star edges (node → local min root). Each round is one map + shuffle
  over a geometrically shrinking star set (round 1 output is bounded by
  Σ per-partition distinct nodes, not by edge multiplicity). Measured on a
  31 M-edge match graph at 32 CPUs, full linkage pipeline: contraction 11 s
  vs 41 s hauling the edges to the driver vs >9.5 min for the round-3 label
  propagation (two hash joins + a groupby over the full edge multiset per
  round).

  The star set of a contracted graph cannot shrink below its node count, so
  when rounds stall above ``driver_threshold`` the loop escalates to
  SYMMETRIZED rounds: each edge is routed to BOTH endpoints' partitions.
  Then every chain junction (n→p alongside p→q) and every multi-parent node
  (n→r1, n→r2) is co-located in some partition, so a round that changes
  nothing — detected by a distributed (count, multiset-checksum) fixpoint —
  proves the set is exact depth-1 stars with component-minimum roots. At
  fixpoint the labels are emitted as a distributed ``groupby(node).min``;
  NO path materializes an unbounded edge set on the driver. The driver
  fast-path only ever sees ≤ ``driver_threshold`` edges; the one remaining
  driver pull (``max_rounds`` exhausted without fixpoint — pathological)
  warns with the measured size first.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pyarrow as pa

from rayssj.joins import _as_dataset, _rename_ds, join_num_partitions


def _edge_arrays(edges_ds):
    """Materialized edges Dataset → (a, b) numpy arrays via Arrow block refs
    (no pandas conversion; ~5x faster than to_pandas at 31 M rows)."""
    import ray

    tables = ray.get(edges_ds.to_arrow_refs())
    a_parts, b_parts = [], []
    for t in tables:
        if t.num_rows == 0:
            continue
        a_parts.append(t["a"].combine_chunks().to_numpy(zero_copy_only=False))
        b_parts.append(t["b"].combine_chunks().to_numpy(zero_copy_only=False))
    if not a_parts:
        return (np.zeros(0, dtype=np.int64),) * 2
    return np.concatenate(a_parts), np.concatenate(b_parts)


def _numpy_cc(a_np: np.ndarray, b_np: np.ndarray):
    """Vectorized connected components over an edge list.

    Returns (nodes, lab): ``nodes`` sorted-unique, ``lab[i]`` the position in
    ``nodes`` of the min node of i's component. Min-label sweeps use a
    one-time per-endpoint argsort + ``minimum.reduceat`` (the ufunc.at
    scatter was ~10x slower at 31 M edges) and pointer jumping; converges in
    O(log diameter) sweeps. Works for int and string node ids (labels are
    positions, and ``nodes`` is sorted, so min position == min node id)."""
    nodes = np.unique(np.concatenate([a_np, b_np]))  # SORTED
    itype = np.int32 if len(nodes) < (1 << 31) else np.int64
    ai = np.searchsorted(nodes, a_np).astype(itype)
    bi = np.searchsorted(nodes, b_np).astype(itype)
    lab = np.arange(len(nodes), dtype=itype)  # rank == position
    perm_a = np.argsort(ai, kind="stable")
    sa = ai[perm_a]
    ua_first = np.concatenate(([True], sa[1:] != sa[:-1]))
    ua = sa[ua_first]
    starts_a = np.nonzero(ua_first)[0]
    perm_b = np.argsort(bi, kind="stable")
    sb = bi[perm_b]
    ub_first = np.concatenate(([True], sb[1:] != sb[:-1]))
    ub = sb[ub_first]
    starts_b = np.nonzero(ub_first)[0]
    while True:
        prev = lab.copy()
        m = np.minimum(lab[ai], lab[bi])
        lab[ua] = np.minimum(lab[ua], np.minimum.reduceat(m[perm_a], starts_a))
        lab[ub] = np.minimum(lab[ub], np.minimum.reduceat(m[perm_b], starts_b))
        lab = np.minimum(lab, lab[lab])  # pointer jump (nodes sorted)
        if np.array_equal(lab, prev):
            break
    return nodes, lab


def _contract_group(t: pa.Table) -> pa.Table:
    """One partition's edges → star edges (node, local min root). The star
    set has exactly one row per distinct node in the partition, so the
    global edge count after a round is bounded by Σ per-partition distinct
    nodes — geometric shrink on match-pair graphs."""
    a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) else t["a"]
    b = t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) else t["b"]
    if len(a) == 0:
        return pa.table({"a": a, "b": b})
    nodes, lab = _numpy_cc(a.to_numpy(zero_copy_only=False),
                           b.to_numpy(zero_copy_only=False))
    return pa.table({"a": pa.array(nodes), "b": pa.array(nodes[lab])})


def _local_contract_batch(t: pa.Table) -> pa.Table:
    """Map-side combiner (no shuffle): replace a batch's edges by their local
    star set when that is smaller. Contracting any edge SUBSET to its
    spanning stars preserves the connected components of the union, so this
    is connectivity-exact. Match graphs are dense (near-clique duplicate
    clusters) and the join kernel emits pairs cluster-adjacent, so a ~1 M-row
    batch typically holds only tens of thousands of distinct nodes — the
    round-1 all-to-all shrinks 5-30× (measured x160 cipher corpus, 154 M
    edges: contraction round 1 at 32 CPUs 122 s → the shuffle now moves
    ~Σ per-batch distinct nodes instead). The num_rows guard keeps sparse
    matching-like batches (stars can have up to 2× the edge count) at their
    original size."""
    if t.num_rows <= 1:
        return t
    c = _contract_group(t.select(["a", "b"]))
    return c if c.num_rows < t.num_rows else t.select(["a", "b"])


def _edge_checksum(edges_ds):
    """Distributed multiset checksum of an (a, b) edge Dataset: u64 sum of a
    per-row avalanche over both endpoint hashes. Order/partitioning invariant;
    equal (count, checksum) across consecutive rounds ⇒ identical multisets
    with overwhelming probability. One tiny row per block reaches the driver."""
    from rayssj.checkpoint import splitmix_u64, stable_hash64

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"c": pa.array([0], type=pa.uint64())})
        ha = (stable_hash64(t["a"].combine_chunks())
              .to_numpy(zero_copy_only=False).view(np.uint64))
        hb = (stable_hash64(t["b"].combine_chunks())
              .to_numpy(zero_copy_only=False).view(np.uint64))
        row = splitmix_u64(ha ^ (hb * np.uint64(0xC2B2AE3D27D4EB4F)))
        tot = np.bitwise_and(np.add.reduce(row, dtype=np.uint64),
                             np.uint64(0xFFFFFFFFFFFFFFFF))
        return pa.table({"c": pa.array([int(tot)], type=pa.uint64())})

    parts = edges_ds.map_batches(partial, batch_format="pyarrow").take_all()
    return sum(int(r["c"]) for r in parts) & 0xFFFFFFFFFFFFFFFF


def connected_components(pairs, l_col: str, r_col: str, max_rounds: int = 24,
                         driver_threshold: int = 2_000_000):
    """Returns a Dataset (node, component) with component = min node id/key of
    the component. Node ids must be orderable (ints or strings).

    Escalation ladder (module docstring): cheap asymmetric contraction rounds
    while they shrink → symmetrized rounds to a (count, checksum) fixpoint
    that IS the answer, emitted distributed → driver finish only for edge
    sets already ≤ ``driver_threshold`` (or, after a warning with the
    measured size, when ``max_rounds`` exhausts without fixpoint)."""
    import ray.data as rd

    from rayssj.checkpoint import stable_hash64

    pairs_ds = _as_dataset(pairs)
    edges = _rename_ds(pairs_ds.select_columns([l_col, r_col]),
                       {l_col: "a", r_col: "b"})

    # materialize the edge set ONCE: every path below consumes it at least
    # twice, and a lazy input would re-execute the whole upstream join
    # pipeline each time. Match pairs are far smaller than the corpus; the
    # object store spills if they don't fit. The fused batch-local
    # contraction combiner shrinks both the materialized set and the round-1
    # shuffle before any all-to-all runs.
    edges = edges.map_batches(_local_contract_batch,
                              batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.Table.from_pandas(
            pd.DataFrame({"node": [], "component": []}),
            preserve_index=False).replace_schema_metadata(None))

    # distributed contraction rounds until the star set fits the driver or
    # the symmetric rounds reach the stars-only fixpoint
    n_parts = join_num_partitions() * 2
    rounds, symmetric = 0, False
    prev_csum = None
    while n_edges > driver_threshold and rounds < max_rounds:
        salt = np.uint64((0x9E3779B97F4A7C15 * (rounds + 1))
                         & 0xFFFFFFFFFFFFFFFF)

        def add_part(t: pa.Table, salt=salt, sym=symmetric) -> pa.Table:
            ha = (stable_hash64(t["a"].combine_chunks()
                                if isinstance(t["a"], pa.ChunkedArray)
                                else t["a"])
                  .to_numpy(zero_copy_only=False).view(np.uint64))
            pa_part = ((ha ^ salt) % np.uint64(n_parts)).astype(np.int64)
            out = t.append_column("part", pa.array(pa_part))
            if not sym:
                return out
            # symmetric round: route a second copy by the b-endpoint so chain
            # junctions and multi-parents co-locate (skip rows where both
            # endpoints land in the same partition — no information added)
            hb = (stable_hash64(t["b"].combine_chunks()
                                if isinstance(t["b"], pa.ChunkedArray)
                                else t["b"])
                  .to_numpy(zero_copy_only=False).view(np.uint64))
            pb_part = ((hb ^ salt) % np.uint64(n_parts)).astype(np.int64)
            diff = np.nonzero(pb_part != pa_part)[0]
            if len(diff) == 0:
                return out
            extra = t.take(pa.array(diff)).append_column(
                "part", pa.array(pb_part[diff]))
            return pa.concat_tables([out, extra])

        def contract(t: pa.Table) -> pa.Table:
            return _contract_group(t.select(["a", "b"]))

        contracted = (edges.map_batches(add_part, batch_format="pyarrow")
                           .groupby("part")
                           .map_groups(contract, batch_format="pyarrow")
                           .materialize())
        n_new = contracted.count()
        rounds += 1
        if symmetric:
            csum = _edge_checksum(contracted)
            if n_new == n_edges and csum == prev_csum:
                # fixpoint: every partition's local view is fully contracted
                # AND every junction is co-located somewhere ⇒ the multiset
                # is exact stars (node → component min, roots self-mapped).
                # Emit the labels distributed — never touches the driver.
                labels = _rename_ds(contracted.groupby("a").min("b"),
                                    {"a": "node", "min(b)": "component"})
                return labels
            prev_csum = csum
        elif n_new > int(0.8 * n_edges):
            # asymmetric rounds stalled (a contracted star set can't shrink
            # below its node count): escalate to symmetric-fixpoint mode
            symmetric = True
            prev_csum = _edge_checksum(contracted)
        edges, n_edges = contracted, n_new

    if n_edges > driver_threshold:
        warnings.warn(
            f"connected_components: no fixpoint after {rounds} rounds; "
            f"pulling {n_edges} residual star edges (~{n_edges * 16 >> 20} "
            f"MiB id-bytes) to the driver — raise max_rounds or "
            f"driver_threshold if this OOMs", RuntimeWarning)

    # driver finish on the (bounded, or warned-about) contracted graph
    a_np, b_np = _edge_arrays(edges)
    nodes, lab = _numpy_cc(a_np, b_np)
    return rd.from_arrow(pa.Table.from_pandas(
        pd.DataFrame({"node": nodes, "component": nodes[lab]}),
        preserve_index=False).replace_schema_metadata(None))


def clusters_from_matches(pairs, l_col: str, r_col: str):
    """Convenience: match pairs → (node, component) Dataset."""
    return connected_components(pairs, l_col, r_col)
