"""sample_pairs — Magellan-style weighted candidate down-sampling
(SURVEY.md §2 #16) [ref: py_stringsimjoin/sampler/sample.py:~20 †U] (L).

Semantics: sample ``sample_size`` r-records; for each, keep the y/2
highest-overlap l-candidates (by distinct shared tokens of the join attrs)
plus y/2 seeded-random l-records. Ray design: ``random_sample`` on R, token
groupby to count overlaps, per-r-group top-k via ``map_groups``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from rayssj.joins import _as_dataset, _clone_tokenizer, _rename_ds, _tokenize_stage, _drop_missing
from rayssj.ordering import TOKENS_COL
from rayssj.tokenizers import _list_parts


def sample_pairs(ltable, rtable, l_key_attr, r_key_attr, l_join_attr,
                 r_join_attr, tokenizer, sample_size, y_param, seed=0,
                 l_out_prefix="l_", r_out_prefix="r_"):
    ds_l = _as_dataset(ltable)
    ds_r = _as_dataset(rtable)
    tk = _clone_tokenizer(tokenizer, return_set=True)

    l_tok = _drop_missing(_tokenize_stage(ds_l, l_key_attr, l_join_attr, tk, False))
    r_tok = _drop_missing(_tokenize_stage(ds_r, r_key_attr, r_join_attr, tk, False))

    n_r = ds_r.count()
    frac = min(1.0, sample_size / max(n_r, 1))
    r_sample = r_tok.random_sample(frac, seed=seed) if frac < 1.0 else r_tok

    # token -> l keys (inverted postings via groupby), joined against sampled
    # r tokens; overlap = count of shared tokens per (l,r)
    def explode(side):
        def fn(batch: pa.Table) -> pa.Table:
            values, lengths = _list_parts(batch[TOKENS_COL])
            row_ids = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
            keys = batch["key"].combine_chunks() if isinstance(batch["key"], pa.ChunkedArray) else batch["key"]
            return pa.table({"token": values,
                             "side": pa.array(np.full(len(values), side, dtype=np.int8)),
                             "key": keys.take(pa.array(row_ids))})
        return fn

    l_keys_all = [r["key"] for r in l_tok.select_columns(["key"]).take_all()]
    half = max(y_param // 2, 1)
    rng = np.random.default_rng(seed)

    exploded = l_tok.map_batches(explode(0), batch_format="pyarrow").union(
        r_sample.map_batches(explode(1), batch_format="pyarrow"))

    def pair_counts(tbl: pa.Table) -> pd.DataFrame:
        df = tbl.to_pandas()
        l = df[df["side"] == 0]
        r = df[df["side"] == 1]
        if l.empty or r.empty:
            return pd.DataFrame({"l_key": [], "r_key": [], "overlap": []})
        m = l.merge(r, on="token")
        out = (m.groupby(["key_x", "key_y"]).size().reset_index(name="overlap")
                .rename(columns={"key_x": "l_key", "key_y": "r_key"}))
        return out

    counts = exploded.groupby("token").map_groups(pair_counts, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    totals = counts.groupby(["l_key", "r_key"]).aggregate(
        Sum("overlap", alias_name="overlap"))

    def topk_plus_random(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("overlap", ascending=False)
        top = g.head(half)[["l_key", "r_key"]]
        r_key = g["r_key"].iloc[0]
        pool = [k for k in l_keys_all if k not in set(top["l_key"])]
        grng = np.random.default_rng((seed, hash(str(r_key)) & 0xFFFF))
        pick = grng.choice(len(pool), size=min(half, len(pool)), replace=False) if pool else []
        rand = pd.DataFrame({"l_key": [pool[i] for i in pick],
                             "r_key": [r_key] * len(pick)})
        return pd.concat([top, rand], ignore_index=True)

    pairs = totals.groupby("r_key").map_groups(topk_plus_random, batch_format="pandas")
    return _rename_ds(pairs, {"l_key": l_out_prefix + l_key_attr,
                               "r_key": r_out_prefix + r_key_attr})
