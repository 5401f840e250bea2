"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "e2e_linkage_sec", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "pairs": {...emitted pair counts...}}

--scaling: runs the same benchmark in two FRESH processes at
num_cpus=8 and num_cpus=32 on the same input (the sandbox substitute for
N vs 4N nodes) and reports both plus efficiency = (t_8 / t_32) / 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# quiet ray.data worker-side WARNING chatter (workers inherit the env of the
# driver-forked raylet; must be set before ray.init). The yaml names Ray 2.49
# private logging classes — guard on the version so a Ray upgrade degrades to
# default logging instead of erroring dictConfig in every worker.
import importlib.metadata as _im

if _im.version("ray").startswith("2.49"):
    os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools",
        "ray_data_logging.yaml"))


def _calibration_probe(seconds: float = 4.0) -> dict:
    """Single-process run of the set-sim kernel microbench
    (tools/matmul_microbench.py --worker) in a fresh OS process: what THIS
    host delivers for the kernel's instruction mix right now, in GFLOP/s.
    run_bench() embeds one probe before and one after the timed reps so a
    round-over-round BENCH delta can be attributed: if the probes moved with
    the query times, the host moved, not the code (VERDICT r04 next #1 —
    identical jobs on this contended box swing ±50%)."""
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools",
                        "matmul_microbench.py")
    impl = "gemm"
    try:
        from rayssj import native
        if native.available():
            impl = "native"
    except Exception:
        pass
    res = subprocess.run(
        [sys.executable, tool, "--worker", "--impl", impl,
         "--seconds", str(seconds)],
        capture_output=True, text=True, check=True)
    out = json.loads(res.stdout.strip().splitlines()[-1])
    return {"impl": impl, "gflops": out["gflops"]}


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as rd

    from rayssj.cluster import connected_components
    from rayssj.dedup import minhash_lsh_pairs
    from rayssj.joins import edit_distance_join, jaccard_join
    from rayssj.tokenizers import QgramTokenizer, WhitespaceTokenizer

    # warm the OS page cache so we measure compute + shuffle, not first-read IO
    rd.read_parquet(f"{sf_dir}/documents.parquet").count()

    pairs: dict[str, int] = {}
    # N reps per query, INTERLEAVED round-robin across queries (rep 1 of every
    # query, then rep 2 of every query, ...): a host-load burst then smears
    # across all queries instead of poisoning one query's whole sample, and
    # min/median/spread per query expose whether a delta is noise. Single runs
    # on this contended shared host swing ±50% (BASELINE.md "Measurement
    # health") and made round-over-round BENCH deltas unattributable.
    reps = int(os.environ.get("RAYSSJ_BENCH_REPS", "5"))

    specs: list[tuple[str, str, object]] = []

    def timed(name: str, count_key: str, fn):
        specs.append((name, count_key, fn))

    def docs():
        return rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    # BASELINE.md headline blocking/scoring config: jaccard, q-gram q=3, t=0.8
    timed("jaccard_q3_08", "jaccard_q3_08", lambda: jaccard_join(
        docs(), None, "doc_id", "doc_id", "text", "text",
        QgramTokenizer(3, return_set=True), 0.8, self_join=True).count())

    timed("jaccard_ws_08", "jaccard_ws_08", lambda: jaccard_join(
        docs(), None, "doc_id", "doc_id", "text", "text",
        WhitespaceTokenizer(), 0.8, self_join=True).count())

    import pyarrow.compute as pc

    def _edit_distance():
        trunc = docs().map_batches(
            lambda t: t.set_column(t.schema.get_field_index("text"), "text",
                                   pc.utf8_slice_codeunits(t["text"], 0, 40)),
            batch_format="pyarrow")
        return edit_distance_join(trunc, None, "doc_id", "doc_id", "text",
                                  "text", QgramTokenizer(2), 3,
                                  self_join=True).count()

    timed("edit_distance_q2_t3", "edit_distance_q2_t3", _edit_distance)

    timed("minhash_lsh", "minhash_lsh", lambda: minhash_lsh_pairs(
        docs(), "doc_id", "text", jaccard_threshold=0.9).count())

    from rayssj.textstats import LangIdScorer, TokenCounter, quality_stats_batch

    # instances as plain task fns: the stages' only state is a pattern
    # string, and Ray Data spawns a fresh actor pool per execution
    timed("textstats", "textstats_rows", lambda: (
        docs()
        .map_batches(quality_stats_batch, batch_format="pyarrow")
        .map_batches(TokenCounter(), batch_format="pyarrow")
        .map_batches(LangIdScorer(), batch_format="pyarrow")
        .count()))

    from rayssj.dedup import embedding_cosine_pairs

    timed("embedding_pairs", "embedding_pairs", lambda: embedding_cosine_pairs(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]),
        "vec_id", "embedding", threshold=0.4).count())

    # headline: full linkage — block+score (jaccard 0.9) then transitive closure
    timed("linkage_e2e", "linkage_clusters", lambda: connected_components(
        jaccard_join(docs(), None, "doc_id", "doc_id", "text", "text",
                     WhitespaceTokenizer(), 0.9, self_join=True),
        "l_doc_id", "r_doc_id").count())

    # execute: calibration probe → interleaved reps → calibration probe
    import statistics

    cal_before = _calibration_probe()
    samples: dict[str, list[float]] = {name: [] for name, _, _ in specs}
    for _rep in range(reps):
        for name, count_key, fn in specs:
            t0 = time.time()
            n = fn()
            samples[name].append(time.time() - t0)
            pairs[count_key] = n

    cal_after = _calibration_probe()

    timings = {name: round(statistics.median(s), 3)
               for name, s in samples.items()}
    detail = {}
    for name, s in samples.items():
        med = statistics.median(s)
        detail[name] = {
            "min": round(min(s), 3), "median": round(med, 3),
            "max": round(max(s), 3),
            "spread_pct": round(100.0 * (max(s) - min(s)) / med, 1)}
    drift = (100.0 * (cal_after["gflops"] - cal_before["gflops"])
             / cal_before["gflops"]) if cal_before["gflops"] else 0.0
    calibration = {
        "workload": "set-sim kernel microbench, 1 proc "
                    "(tools/matmul_microbench.py)",
        "impl": cal_before["impl"],
        "gflops_before": cal_before["gflops"],
        "gflops_after": cal_after["gflops"],
        "host_drift_pct": round(drift, 1)}

    headline = timings["linkage_e2e"]
    out = {"metric": "e2e_linkage_sec", "value": headline, "unit": "sec",
           "queries": timings, "queries_detail": detail,
           "calibration": calibration, "pairs": pairs, "reps": reps,
           "interleaved": True,
           "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1], "num_cpus": num_cpus}
    ray.shutdown()
    return out


_SCALE_REPLICAS = int(os.environ.get("RAYSSJ_SCALE_REPLICAS", "96"))
# v2: 20k-row parquet row groups. v1 wrote one giant row group, which made
# ray.data's parquet read a SINGLE task — a multi-second serial ramp at the
# head of every measurement (and unrepresentative: a real corpus is many
# files). Row groups are the read-parallelism unit.
_SCALE_DIR = f"/tmp/rayssj_scaling_cipher_v2_x{_SCALE_REPLICAS}"
_SCALE_ROW_GROUP = 20_000


def _cipher_table(i: int) -> bytes | None:
    """Per-replica byte-translation table: a seeded permutation of the
    printable non-space ASCII range (0x21-0x7e). Replica 0 is identity."""
    if i == 0:
        return None
    import numpy as np

    rng = np.random.default_rng(1000 + i)
    chars = np.arange(0x21, 0x7f, dtype=np.uint8)
    perm = chars.copy()
    rng.shuffle(perm)
    tbl = bytearray(range(256))
    tbl[0x21:0x7f] = perm.tobytes()
    return bytes(tbl)


def _build_scaling_input() -> str:
    """Deterministic enlargement of sf0.1 documents at the corpus's NATURAL
    match density: each replica gets doc_ids remapped AND its text passed
    through a per-replica character-substitution cipher (whitespace
    preserved, replica 0 identity). A cipher is a bijection on q-grams and
    on whitespace tokens, so WITHIN a replica every similarity is exactly
    that of the original corpus, while ACROSS replicas token/gram sets are
    disjoint-by-construction (modulo rare accidental collisions that the
    verify kernel rejects) — work and output pairs scale LINEARLY in
    replicas. The earlier identical-replica protocol (rounds 1-3) made
    pairs grow QUADRATICALLY (every doc matched its R-1 clones at ~12.8k
    pairs/doc by x16), so the 4N-level measurement degenerated into
    duplicate-pair Arrow emission bandwidth instead of blocking+verification
    throughput. The SAME enlarged input is used at both parallelism levels;
    replicas are sized so the 4N (32-CPU) level stays >= ~80 s."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(_SCALE_DIR, exist_ok=True)
    out = os.path.join(_SCALE_DIR, "documents.parquet")
    if not os.path.exists(out):
        sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids0 = t["doc_id"].to_pylist()
        texts0 = [s.encode() for s in t["text"].to_pylist()]
        # the cipher permutes only printable ASCII (0x21-0x7e): bytes >= 0x7f
        # are identity-mapped, so tokens differing only in such bytes would
        # collide across replicas and break the disjointness invariant the
        # linear-scaling protocol rests on (ADVICE r04). Guard it.
        n_bytes = sum(len(s) for s in texts0)
        n_nonascii = sum(sum(b >= 0x7f for b in s) for s in texts0)
        assert n_bytes == 0 or n_nonascii / n_bytes < 1e-3, (
            f"scaling corpus is {100 * n_nonascii / n_bytes:.2f}% non-ASCII; "
            "the byte-substitution cipher only guarantees cross-replica "
            "token disjointness for (near-)ASCII corpora")
        parts = []
        for i in range(_SCALE_REPLICAS):
            ids = pa.array([v + i * 10_000_000 for v in ids0], type=pa.int64())
            tbl = _cipher_table(i)
            texts = (t["text"] if tbl is None else
                     pa.array([s.translate(tbl).decode() for s in texts0]))
            parts.append(pa.table({"doc_id": ids, "text": texts}))
        pq.write_table(pa.concat_tables(parts), out,
                       row_group_size=_SCALE_ROW_GROUP)
    return out


def run_scaling_level() -> dict:
    """One fresh-process measurement: warm-up join (untimed), then the
    headline jaccard q-gram join on the scaling input."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd

    from rayssj.joins import jaccard_join
    from rayssj.tokenizers import QgramTokenizer

    path = os.environ["RAYSSJ_SCALING_INPUT"]
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    docs.count()  # page-cache warm
    # worker/actor warm-up (untimed): tiny high-threshold join
    jaccard_join(docs, None, "doc_id", "doc_id", "text", "text",
                 QgramTokenizer(3, return_set=True), 0.95, self_join=True).count()
    t0 = time.time()
    n = jaccard_join(docs, None, "doc_id", "doc_id", "text", "text",
                     QgramTokenizer(3, return_set=True), 0.5, self_join=True).count()
    sec = time.time() - t0
    out = {"sec": round(sec, 3), "pairs": n, "num_cpus": num_cpus,
           "pairs_per_sec": round(n / sec, 1)}
    ray.shutdown()
    return out


def run_scaling_e2e_level() -> dict:
    """One fresh-process e2e measurement: the full linkage pipeline
    (tokenize → block → score at jaccard ws 0.9 → transitive clustering)
    on the scaling input. Above the driver fast-path cap this exercises the
    DISTRIBUTED iterative-local-contraction path (rayssj/cluster.py) — the
    north-rule pipeline shape."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd

    from rayssj.cluster import connected_components
    from rayssj.joins import jaccard_join
    from rayssj.tokenizers import WhitespaceTokenizer

    path = os.environ["RAYSSJ_SCALING_INPUT"]
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    docs.count()  # page-cache warm
    # worker warm-up (untimed)
    jaccard_join(docs, None, "doc_id", "doc_id", "text", "text",
                 WhitespaceTokenizer(), 0.99, self_join=True).count()
    t0 = time.time()
    n = connected_components(
        jaccard_join(docs, None, "doc_id", "doc_id", "text", "text",
                     WhitespaceTokenizer(), 0.9, self_join=True),
        "l_doc_id", "r_doc_id").count()
    sec = time.time() - t0
    out = {"sec": round(sec, 3), "clusters": n, "num_cpus": num_cpus}
    ray.shutdown()
    return out


def run_at(ncpu: int, extra_env=None, arg=None) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), **(extra_env or {}))
    cmd = [sys.executable, os.path.abspath(__file__)] + ([arg] if arg else [])
    res = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         check=True,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    return json.loads(res.stdout.strip().splitlines()[-1])


def main():
    if "--scaling-level" in sys.argv:
        print(json.dumps(run_scaling_level()))
        return
    if "--scaling-e2e-level" in sys.argv:
        print(json.dumps(run_scaling_e2e_level()))
        return
    if "--scaling-e2e" in sys.argv:
        path = _build_scaling_input()
        env = {"RAYSSJ_SCALING_INPUT": path}
        lo = min((run_at(8, env, "--scaling-e2e-level") for _ in range(2)),
                 key=lambda r: r["sec"])
        hi = min((run_at(32, env, "--scaling-e2e-level") for _ in range(2)),
                 key=lambda r: r["sec"])
        eff = (lo["sec"] / hi["sec"]) / (32 / 8)
        # same-window hardware ceiling for an EMISSION-bound job: the e2e
        # pipeline is dominated by pair-block construction + object-store
        # movement (memory bandwidth, shared across all cores of one box),
        # so its single-node 8→32 efficiency is capped by how aggregate copy
        # bandwidth scales — not by CPU count (tools/membw_microbench.py).
        tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools", "membw_microbench.py")
        bw = json.loads(subprocess.run(
            [sys.executable, tool], capture_output=True, text=True,
            check=True).stdout.strip().splitlines()[-1])
        print(json.dumps({
            "input": f"sf0.1 documents cipher-x{_SCALE_REPLICAS} ({_SCALE_REPLICAS * 5000} docs)",
            "headline": "linkage e2e: jaccard ws t=0.9 + transitive clustering",
            "sec_8": lo["sec"], "sec_32": hi["sec"],
            "clusters": hi["clusters"],
            "best_of": 2,
            "scaling_efficiency": round(eff, 3),
            "membw_ceiling_8_32": bw["membw_scaling_ceiling"],
            "membw_agg_gbps": {"8": bw["at_8"]["agg_gbps"],
                               "32": bw["at_32"]["agg_gbps"]}}))
        return
    if "--scaling" in sys.argv:
        path = _build_scaling_input()
        env = {"RAYSSJ_SCALING_INPUT": path}
        # best-of-2 per level: this host is a contended shared box (observed
        # t_32 swinging 35-90s on identical code); min-of-repeats measures
        # the code, not the neighbors
        lo = min((run_at(8, env, "--scaling-level") for _ in range(2)),
                 key=lambda r: r["sec"])
        hi = min((run_at(32, env, "--scaling-level") for _ in range(2)),
                 key=lambda r: r["sec"])
        eff = (lo["sec"] / hi["sec"]) / (32 / 8)
        print(json.dumps({
            "input": f"sf0.1 documents x{_SCALE_REPLICAS} ({_SCALE_REPLICAS * 5000} docs)",
            "headline": "jaccard self-join, qgram q=3, t=0.5",
            "sec_8": lo["sec"], "sec_32": hi["sec"],
            "pairs": hi["pairs"],
            "pairs_per_sec_8": lo["pairs_per_sec"],
            "pairs_per_sec_32": hi["pairs_per_sec"],
            "best_of": 2,
            "scaling_efficiency": round(eff, 3)}))
        return
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
