"""Driver-style correctness harness: run each __ray_entry__ query and its
DuckDB oracle on the same sf dir; compare row count + order-insensitive
values (the driver's CORRECTNESS gate, SURVEY.md §5.6).

Usage: python tools/check_queries.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time
import os

# quiet ray.data worker-side WARNING chatter (inherited by forked workers).
# The yaml names Ray 2.49 private logging classes — version-guarded so a Ray
# upgrade degrades to default logging instead of erroring in every worker.
import importlib.metadata as _im

if _im.version("ray").startswith("2.49"):
    os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ray_data_logging.yaml"))


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


# ---------------------------------------------------------------- py oracles
#
# Brute-force reference implementations (plain python/numpy all-pairs loops,
# NO Ray, none of the engine's blocking/shuffle machinery) for the queries
# whose semantics aren't SQL-expressible. Hash-compared exactly like the SQL
# oracles.

_FNV = 1099511628211
_M64 = (1 << 64) - 1


def _py_shingles(text: str, k: int = 5):
    """Sorted distinct k-shingle hashes, scalar spec: width-k polynomial over
    code points, murmur-style finalizer (matches rayssj's published spec)."""
    import numpy as np

    if len(text) < k:
        return np.array([], dtype=np.uint64)
    out = set()
    for i in range(len(text) - k + 1):
        h = 0
        for ch in text[i:i + k]:
            h = (h * _FNV + ord(ch)) & _M64
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & _M64
        h ^= h >> 33
        out.add(h)
    return np.array(sorted(out), dtype=np.uint64)


def _py_docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def _py_simhash_pairs(sf_dir):
    docs = _py_docs(sf_dir)
    sigs = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        sh = _py_shingles(text or "", 5)
        if len(sh) == 0:
            sigs[did] = 0
            continue
        sig = 0
        for j in range(64):
            cnt = int(((sh >> np.uint64(j)) & np.uint64(1)).sum())
            if 2 * cnt - len(sh) > 0:
                sig |= 1 << j
        sigs[did] = sig
    ids = sorted(sigs)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= 3:
                rows.append((a, b, float(d)))
    return pd.DataFrame(rows, columns=["l_doc_id", "r_doc_id", "_sim_score"])


def _py_minhash_pairs(sf_dir, num_perm=64, bands=16, k=5, threshold=0.9,
                      seed=42):
    docs = _py_docs(sf_dir)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    p = np.uint64((1 << 61) - 1)
    r = num_perm // bands
    sk = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        sh = _py_shingles(text or "", k)
        if len(sh) == 0:
            sk[did] = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            sk[did] = ((a[:, None] * (sh[None, :] % p) + b[:, None]) % p).min(axis=1)
    ids = sorted(sk)
    rows = []
    for i, x in enumerate(ids):
        for y in ids[i + 1:]:
            eq = sk[x] == sk[y]
            collides = any(eq[bi * r:(bi + 1) * r].all() for bi in range(bands))
            est = eq.mean()
            if collides and est >= threshold:
                rows.append((x, y, round(float(est), 6)))
    return pd.DataFrame(rows, columns=["l_doc_id", "r_doc_id", "_sim_score"])


def _py_suffix_filter(sf_dir, t=0.9, max_depth=2):
    """All-pairs scalar PPJoin+ suffix filter (Xiao et al. WWW'08 bound,
    depth-limited), whitespace tokens, JACCARD t=0.9 — the spec the
    distributed prefix-block + batch-refine pipeline must reproduce."""
    import math

    def ceil_(x):
        return int(math.ceil(x - 1e-9))

    def hamming_lb(x, y, hmax, depth):
        if len(x) > len(y):
            x, y = y, x
        if not x or not y or depth > max_depth:
            return abs(len(x) - len(y))
        import bisect

        mid = len(y) // 2
        w = y[mid]
        pp = bisect.bisect_left(x, w)
        found = pp < len(x) and x[pp] == w
        diff = 0 if found else 1
        xl, xr = x[:pp], x[pp + (1 if found else 0):]
        yl, yr = y[:mid], y[mid + 1:]
        h = abs(len(xl) - len(yl)) + abs(len(xr) - len(yr)) + diff
        if h > hmax:
            return h
        hl = hamming_lb(xl, yl, hmax - abs(len(xr) - len(yr)) - diff, depth + 1)
        h = hl + abs(len(xr) - len(yr)) + diff
        if h > hmax:
            return h
        hr = hamming_lb(xr, yr, hmax - hl - diff, depth + 1)
        return hl + hr + diff

    def keep(sa, sb):
        if sa is None or sb is None:
            return False
        lt = list(dict.fromkeys(sa.split()))
        rt = list(dict.fromkeys(sb.split()))
        if not lt and not rt:
            return True  # allow_empty default
        if not lt or not rt:
            return False
        freq = {}
        for tok in lt + rt:
            freq[tok] = freq.get(tok, 0) + 1
        rank = {tok: i for i, tok in
                enumerate(sorted(freq, key=lambda w: (freq[w], w)))}
        lo = sorted(lt, key=rank.get)
        ro = sorted(rt, key=rank.get)
        pl = max(len(lo) - ceil_(t * len(lo)) + 1, 0)
        pr = max(len(ro) - ceil_(t * len(ro)) + 1, 0)
        if not set(lo[:pl]) & set(ro[:pr]):
            return False
        ot = max(ceil_(t / (1 + t) * (len(lo) + len(ro))), 1)
        need = ot - pl - pr
        if need <= 0:
            return True
        ls = sorted(rank[w] for w in lo[pl:])
        rs = sorted(rank[w] for w in ro[pr:])
        hmax = len(ls) + len(rs) - 2 * need
        if hmax < 0:
            return False
        return hamming_lb(ls, rs, hmax, 1) <= hmax

    docs = _py_docs(sf_dir)
    ids = list(docs["doc_id"])
    texts = dict(zip(docs["doc_id"], docs["text"]))
    order = sorted(ids)
    rows = [(x, y) for i, x in enumerate(order) for y in order[i + 1:]
            if keep(texts[x], texts[y])]
    return pd.DataFrame(rows, columns=["l_doc_id", "r_doc_id"])


def _py_fingerprint(sf_dir):
    docs = _py_docs(sf_dir)
    fps = []
    for text in docs["text"]:
        h = 0
        for byte in (text or "").encode("utf-8"):
            h = (h * _FNV + byte) & _M64
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & _M64
        h ^= h >> 33
        fps.append(np.uint64(h).astype(np.int64))
    return pd.DataFrame({"doc_id": docs["doc_id"],
                         "fingerprint": np.array(fps, dtype=np.int64)})


def _py_sample_pairs(sf_dir, sample_size=50, y_param=6, seed=7):
    """Scalar-python reimplementation of rayssj.sampler.sample_pairs on the
    documents self-pair config of __ray_entry__._q_sample_pairs. Checkable
    because every stage is a pure function of key values: Bernoulli R-sample
    via splitmix64(hash64(key) ^ mix(seed)) < frac·2⁶⁴, top-y/2 by distinct
    whitespace-token overlap (ties by l key), fill = y/2 smallest priorities
    splitmix64(hash64(l) ^ splitmix64(hash64(r) ^ seed))."""

    def sm(v):
        v = (v + 0x9E3779B97F4A7C15) & _M64
        v ^= v >> 30
        v = (v * 0xBF58476D1CE4E5B9) & _M64
        v ^= v >> 27
        v = (v * 0x94D049BB133111EB) & _M64
        v ^= v >> 31
        return v

    docs = _py_docs(sf_dir)
    ids = [int(x) for x in docs["doc_id"]]
    texts = dict(zip(ids, docs["text"]))
    toks = {k: set((texts[k] or "").split()) for k in ids}
    n_r = len(ids)
    frac = min(1.0, sample_size / max(n_r, 1))
    if frac < 1.0:
        salt = sm((seed & _M64) ^ 0xA24BAED4963EE407)  # sampler._SAMPLE_SALT
        thresh = int(frac * 2.0 ** 64)
        r_keys = [k for k in ids if sm(sm(k) ^ salt) < thresh]
    else:
        r_keys = list(ids)
    half = max(y_param // 2, 1)
    out = []
    for rk in r_keys:
        rt = toks[rk]
        cands = sorted(((len(toks[lk] & rt), lk) for lk in ids
                        if len(toks[lk] & rt) >= 1), key=lambda t: (-t[0], t[1]))
        top_l = [lk for _, lk in cands[:half]]
        ex = set(top_l)
        stream = sm(sm(rk) ^ (seed & _M64))
        pris = sorted((sm(sm(lk) ^ stream), lk) for lk in ids if lk not in ex)
        out += [(lk, rk) for lk in top_l]
        out += [(lk, rk) for _, lk in pris[:half]]
    return pd.DataFrame(out, columns=["l_doc_id", "r_doc_id"])


PY_ORACLES = {
    "simhash_pairs": _py_simhash_pairs,
    "minhash_pairs": _py_minhash_pairs,
    "suffix_filter": _py_suffix_filter,
    "fingerprint": _py_fingerprint,
    "sample_pairs": _py_sample_pairs,
}


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
            if name in PY_ORACLES:
                try:
                    oracle = PY_ORACLES[name](sf_dir)
                except Exception as e:
                    print(f"{name:22s} PY-ORACLE ERROR: {e}")
                    failures += 1
                    continue
                verdict = compare(name, mine, oracle)
                status = "✓" if verdict == "OK" else "✗"
                print(f"{name:22s} rows={len(mine):>8}  {t1-t0:6.1f}s  "
                      f"{status} {verdict} (py-oracle)")
                if verdict != "OK":
                    failures += 1
                continue
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
