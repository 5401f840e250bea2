"""sample_pairs — Magellan-style weighted candidate down-sampling
(SURVEY.md §2 #16) [ref: py_stringsimjoin/sampler/sample.py:~20 †U] (L).

Semantics: sample ``sample_size`` r-records; for each, keep the y/2
highest-overlap l-candidates (distinct shared join-attr tokens) plus y/2
seeded-random l-records. Ray design: ``random_sample`` on R, then ONE
overlap-join (threshold 1) of L against the sampled R reusing the salted
prefix-blocking kernel — the candidate counts come out vectorized; the final
per-r top-k + random fill is driver-side over the (bounded, sample-sized)
candidate set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from rayssj.joins import _as_dataset, _rename_ds, _set_sim_join


def sample_pairs(ltable, rtable, l_key_attr, r_key_attr, l_join_attr,
                 r_join_attr, tokenizer, sample_size, y_param, seed=0,
                 l_out_prefix="l_", r_out_prefix="r_"):
    ds_l = _as_dataset(ltable)
    ds_r = _as_dataset(rtable)

    n_r = ds_r.count()
    frac = min(1.0, sample_size / max(n_r, 1))
    r_sample = ds_r.random_sample(frac, seed=seed) if frac < 1.0 else ds_r
    r_sample = r_sample.materialize()  # bounded by sample_size

    pairs = _set_sim_join(ds_l, r_sample, l_key_attr, r_key_attr, l_join_attr,
                          r_join_attr, tokenizer, "OVERLAP", 1,
                          allow_empty=False).to_pandas()
    lcol, rcol = f"l_{l_key_attr}", f"r_{r_key_attr}"

    l_keys_all = [r[l_key_attr] for r in
                  ds_l.select_columns([l_key_attr]).take_all()]
    r_keys = [r[r_key_attr] for r in
              r_sample.select_columns([r_key_attr]).take_all()]

    half = max(y_param // 2, 1)
    out_l, out_r = [], []
    by_r = dict(tuple(pairs.groupby(rcol))) if len(pairs) else {}
    for rk in sorted(r_keys, key=str):
        g = by_r.get(rk)
        if g is not None:
            top = (g.sort_values(["_sim_score", lcol], ascending=[False, True])
                    .head(half)[lcol].tolist())
        else:
            top = []
        pool = [k for k in l_keys_all if k not in set(top)]
        grng = np.random.default_rng((seed, hash(str(rk)) & 0xFFFF))
        pick = (grng.choice(len(pool), size=min(half, len(pool)), replace=False)
                if pool else [])
        for lk in top + [pool[i] for i in pick]:
            out_l.append(lk)
            out_r.append(rk)

    import ray.data as rd

    out = rd.from_pandas(pd.DataFrame({
        l_out_prefix + l_key_attr: out_l,
        r_out_prefix + r_key_attr: out_r}))
    return out
