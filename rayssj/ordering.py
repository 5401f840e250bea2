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
import ray

from rayssj.tokenizers import _list_parts


TOKENS_COL = "__tokens"


def _partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (token, partial count) — shrinks the shuffle."""
    values, _ = _list_parts(batch[TOKENS_COL])
    if len(values) == 0:
        return pa.table({"token": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    vc = values.value_counts()
    return pa.table({"token": vc.field("values"), "cnt": vc.field("counts")})


def build_token_order(*tokenized_datasets) -> pd.Index:
    """Compute the global rank order over one or more tokenized Datasets
    (each must carry a ``__tokens`` list<string> column).

    Returns a pandas Index whose position IS the rank (ascending frequency,
    ties by token value) — ``index.get_indexer(tokens)`` maps token → rank at
    C speed inside encoder actors.
    """
    from ray.data.aggregate import Sum

    ds = tokenized_datasets[0]
    for other in tokenized_datasets[1:]:
        ds = ds.union(other)
    counts = (ds.map_batches(_partial_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("token").aggregate(Sum("cnt", alias_name="cnt")))
    pdf = counts.to_pandas()
    if pdf.empty or "token" not in pdf.columns:  # empty input table
        return pd.Index([], dtype=object)
    pdf = pdf.sort_values(["cnt", "token"], kind="mergesort", ignore_index=True)
    return pd.Index(pdf["token"])


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
