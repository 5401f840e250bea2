"""Distributed transitive-closure clustering of match pairs (north_star stage;
not in the reference — SURVEY.md §2 'Not present' list).

connected_components(pairs_ds, l_col, r_col) → Dataset(node, component).

Algorithm: iterative min-label propagation (hash-partitioned, no driver-side
union-find over the full edge set):
  label(v) := min(v ∪ neighbors' labels), repeated until fixpoint —
  each round is one groupby-shuffle over (node → candidate labels);
  converges in O(log(diameter)) rounds for typical near-dup clusters
  (which are tiny and dense). When the EDGE LIST fits a bounded driver
  budget (< driver_threshold edges, default 50 M ≈ 800 MB of int64 pairs —
  the match-pair set, not the corpus), a vectorized numpy min-label +
  pointer-jumping loop on the driver replaces the multi-shuffle rounds:
  each distributed round costs two hash joins + a groupby over the edge
  multiset, so a 31 M-edge graph that the driver loop closes in seconds
  takes minutes of shuffle rounds distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayssj.joins import _as_dataset, _drop_if_present, _rename_ds, hash_join, join_num_partitions


def _min_label_round(edges_ds, labels_ds):
    """One propagation round: join edge endpoints to labels, emit candidate
    labels for both endpoints, keep per-node min. The prior label rides
    along as ``old`` (null on candidate rows, so ``Min("old")`` recovers it
    per node) — the fixpoint check is then a cheap map over the aggregated
    output instead of a third hash join per round."""
    from ray.data.aggregate import Min

    # edges carry (a, b); labels carry (node, label)
    la_side = _rename_ds(labels_ds, {"node": "__na", "label": "la"})
    lb_side = _rename_ds(labels_ds, {"node": "__nb", "label": "lb"})
    e1 = hash_join(edges_ds, la_side, on=("a",), right_on=("__na",))
    e1 = _drop_if_present(e1, ["__na"])
    e2 = hash_join(e1, lb_side, on=("b",), right_on=("__nb",))
    e2 = _drop_if_present(e2, ["__nb"])

    def emit(batch: pa.Table) -> pa.Table:
        la = batch["la"].to_numpy(zero_copy_only=False)
        lb = batch["lb"].to_numpy(zero_copy_only=False)
        m = np.minimum(la, lb)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        lab = pa.array(np.concatenate([m, m]))
        return pa.table({"node": pa.array(np.concatenate([a, b])),
                         "label": lab,
                         "old": pa.nulls(2 * len(a), type=lab.type)})

    def carry_old(batch: pa.Table) -> pa.Table:
        lab = batch["label"]
        lab = lab.combine_chunks() if isinstance(lab, pa.ChunkedArray) else lab
        return pa.table({"node": batch["node"], "label": lab, "old": lab})

    cand = e2.map_batches(emit, batch_format="pyarrow")
    allc = cand.union(labels_ds.map_batches(carry_old, batch_format="pyarrow"))
    return allc.groupby("node").aggregate(Min("label", alias_name="label"),
                                          Min("old", alias_name="old"))


def connected_components(pairs, l_col: str, r_col: str, max_rounds: int = 50,
                         driver_threshold: int = 50_000_000):
    """Returns a Dataset (node, component) with component = min node id/key of
    the component. Node ids must be orderable (ints or strings)."""
    import ray.data as rd

    pairs_ds = _as_dataset(pairs)
    edges = _rename_ds(pairs_ds.select_columns([l_col, r_col]),
                       {l_col: "a", r_col: "b"})

    # materialize the edge set ONCE: every path below consumes it at least
    # twice (count + to_pandas on the driver fast path; once per propagation
    # round otherwise), and a lazy input would re-execute the whole upstream
    # join pipeline each time. Match pairs are far smaller than the corpus;
    # the object store spills if they don't fit.
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.Table.from_pandas(
            pd.DataFrame({"node": [], "component": []}),
            preserve_index=False).replace_schema_metadata(None))
    if n_edges <= driver_threshold:
        # bounded-graph fast path: VECTORIZED min-label propagation with
        # pointer jumping on the driver. The edge list is capped by
        # ``driver_threshold`` (default 50 M edges ≈ 800 MB of int64 pairs —
        # far below the corpus itself; the distributed path below streams
        # any size). Each sweep is O(E) numpy (minimum.at scatter + l=l[l]
        # pointer jump), converging in O(log diameter) sweeps — the round-1
        # per-edge python union-find loop took ~minutes at 31 M edges where
        # this takes seconds.
        df = edges.to_pandas()
        nodes = pd.unique(pd.concat([df["a"], df["b"]], ignore_index=True))
        idx = pd.Index(nodes)
        ai = idx.get_indexer(df["a"]).astype(np.int64)
        bi = idx.get_indexer(df["b"]).astype(np.int64)
        order = np.argsort(nodes, kind="stable")
        rank_of = np.empty(len(nodes), dtype=np.int64)
        rank_of[order] = np.arange(len(nodes), dtype=np.int64)
        # labels are RANKS in sorted-node order so min-label == min node id
        # for any orderable node type (ints or strings)
        lab = rank_of.copy()
        while True:
            prev = lab.copy()
            m = np.minimum(lab[ai], lab[bi])
            np.minimum.at(lab, ai, m)
            np.minimum.at(lab, bi, m)
            lab = np.minimum(lab, lab[order[lab]])  # pointer jump
            if np.array_equal(lab, prev):
                break
        sorted_nodes = nodes[order]
        comp = sorted_nodes[lab]
        return rd.from_arrow(pa.Table.from_pandas(
            pd.DataFrame({"node": nodes, "component": comp}),
            preserve_index=False).replace_schema_metadata(None))

    # distributed label propagation
    def init_labels(batch: pa.Table) -> pa.Table:
        a = batch["a"]
        b = batch["b"]
        nodes = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                                  b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b])
        return pa.table({"node": nodes, "label": nodes})

    from ray.data.aggregate import Min

    labels = (edges.map_batches(init_labels, batch_format="pyarrow")
                   .groupby("node").aggregate(Min("label", alias_name="label")))

    for _ in range(max_rounds):
        agg = _min_label_round(edges, labels).materialize()
        # fixpoint check from the fused old column — no extra join
        changed = agg.map_batches(
            lambda t: pa.table({"c": pa.array(
                [int((t["label"].to_numpy(zero_copy_only=False)
                      != t["old"].to_numpy(zero_copy_only=False)).sum())],
                type=pa.int64())}),
            batch_format="pyarrow").sum("c")
        labels = agg.select_columns(["node", "label"])
        if not changed:
            break
    return _rename_ds(labels, {"label": "component"})


def clusters_from_matches(pairs, l_col: str, r_col: str):
    """Convenience: match pairs → (node, component) Dataset."""
    return connected_components(pairs, l_col, r_col)
