"""Distributed transitive-closure clustering of match pairs (north_star stage;
not in the reference — SURVEY.md §2 'Not present' list).

connected_components(pairs_ds, l_col, r_col) → Dataset(node, component).

Algorithm: iterative min-label propagation (hash-partitioned, no driver-side
union-find over the full edge set):
  label(v) := min(v ∪ neighbors' labels), repeated until fixpoint —
  each round is one groupby-shuffle over (node → candidate labels);
  converges in O(log(diameter)) rounds for typical near-dup clusters
  (which are tiny and dense). A driver-side union-find handles ONLY the
  final small active frontier when it fits (< driver_threshold edges),
  short-circuiting the long tail of rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayssj.joins import _as_dataset, _drop_if_present, _rename_ds, hash_join, join_num_partitions


def _min_label_round(edges_ds, labels_ds):
    """One propagation round: join edge endpoints to labels, emit candidate
    labels for both endpoints, keep per-node min."""
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
        return pa.table({"node": pa.array(np.concatenate([a, b])),
                         "label": pa.array(np.concatenate([m, m]))})

    cand = e2.map_batches(emit, batch_format="pyarrow")
    allc = cand.union(labels_ds)
    return allc.groupby("node").aggregate(Min("label", alias_name="label"))


def connected_components(pairs, l_col: str, r_col: str, max_rounds: int = 50,
                         driver_threshold: int = 2_000_000):
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
        # small-graph fast path: exact union-find on the driver
        df = edges.to_pandas()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(df["a"], df["b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra <= rb else (rb, ra)
                parent[hi] = lo
        nodes = pd.unique(pd.concat([df["a"], df["b"]], ignore_index=True))
        comp = [find(n) for n in nodes]
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
        new_labels = _min_label_round(edges, labels).materialize()
        # fixpoint check: count changed labels via an anti-join-style compare
        old_side = _rename_ds(labels, {"node": "__n_old", "label": "label_old"})
        joined = hash_join(new_labels, old_side, on=("node",), right_on=("__n_old",))
        changed = joined.map_batches(
            lambda t: pa.table({"c": pa.array(
                [int((t["label"].to_numpy(zero_copy_only=False)
                      != t["label_old"].to_numpy(zero_copy_only=False)).sum())],
                type=pa.int64())}),
            batch_format="pyarrow").sum("c")
        labels = new_labels
        if not changed:
            break
    return _rename_ds(labels, {"label": "component"})


def clusters_from_matches(pairs, l_col: str, r_col: str):
    """Convenience: match pairs → (node, component) Dataset."""
    return connected_components(pairs, l_col, r_col)
