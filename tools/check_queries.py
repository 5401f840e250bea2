"""Driver-style correctness harness: run each __ray_entry__ query and its
DuckDB oracle on the same sf dir; compare row count + order-insensitive
values (the driver's CORRECTNESS gate, SURVEY.md §5.6).

Usage: python tools/check_queries.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name, mine: pd.DataFrame, oracle: pd.DataFrame) -> str:
    if len(mine) != len(oracle):
        return f"ROWCOUNT {len(mine)} vs {len(oracle)}"
    if sorted(mine.columns) != sorted(oracle.columns):
        return f"SCHEMA {sorted(mine.columns)} vs {sorted(oracle.columns)}"
    a, b = canon(mine), canon(oracle)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0,
                               equal_nan=True):
                exact = np.array_equal(av.astype(float), bv.astype(float))
                bad = np.nonzero(av.astype(float) != bv.astype(float))[0][:3]
                return f"VALUES col {c} differ at rows {bad}: {av[bad]} vs {bv[bad]}"
        else:
            if not np.array_equal(av.astype(str), bv.astype(str)):
                bad = np.nonzero(av.astype(str) != bv.astype(str))[0][:3]
                return f"VALUES col {c} differ at rows {bad}: {av[bad]} vs {bv[bad]}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:22s} ENGINE ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"{name:22s} rows={len(mine):>8}  {t1-t0:6.1f}s  (rows-only, no oracle)")
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:22s} ORACLE ERROR: {e}")
            failures += 1
            continue
        verdict = compare(name, mine, oracle)
        status = "✓" if verdict == "OK" else "✗"
        print(f"{name:22s} rows={len(mine):>8}  {t1-t0:6.1f}s  {status} {verdict}")
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
