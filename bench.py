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

    timings: dict[str, float] = {}
    pairs: dict[str, int] = {}

    def docs():
        return rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    t0 = time.time()
    p = jaccard_join(docs(), None, "doc_id", "doc_id", "text", "text",
                     WhitespaceTokenizer(), 0.8, self_join=True)
    pairs["jaccard_ws_08"] = p.count()
    timings["jaccard_ws_08"] = round(time.time() - t0, 3)

    t0 = time.time()
    import pyarrow.compute as pc

    trunc = docs().map_batches(
        lambda t: t.set_column(t.schema.get_field_index("text"), "text",
                               pc.utf8_slice_codeunits(t["text"], 0, 40)),
        batch_format="pyarrow")
    p = edit_distance_join(trunc, None, "doc_id", "doc_id", "text", "text",
                           QgramTokenizer(2), 3, self_join=True)
    pairs["edit_distance_q2_t3"] = p.count()
    timings["edit_distance_q2_t3"] = round(time.time() - t0, 3)

    t0 = time.time()
    p = minhash_lsh_pairs(docs(), "doc_id", "text", jaccard_threshold=0.9)
    pairs["minhash_lsh"] = p.count()
    timings["minhash_lsh"] = round(time.time() - t0, 3)

    # headline: full linkage — block+score (jaccard 0.9) then transitive closure
    t0 = time.time()
    p = jaccard_join(docs(), None, "doc_id", "doc_id", "text", "text",
                     WhitespaceTokenizer(), 0.9, self_join=True)
    comps = connected_components(p, "l_doc_id", "r_doc_id")
    pairs["linkage_clusters"] = comps.count()
    timings["linkage_e2e"] = round(time.time() - t0, 3)

    headline = timings["linkage_e2e"]
    out = {"metric": "e2e_linkage_sec", "value": headline, "unit": "sec",
           "queries": timings, "pairs": pairs,
           "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1], "num_cpus": num_cpus}
    ray.shutdown()
    return out


def run_at(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    res = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                         capture_output=True, text=True, check=True,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    return json.loads(res.stdout.strip().splitlines()[-1])


def main():
    if "--scaling" in sys.argv:
        lo, hi = run_at(8), run_at(32)
        # pairs-scored/sec at each level from the headline jaccard join
        eff = (lo["value"] / hi["value"]) / (32 / 8)
        print(json.dumps({
            "sec_8": lo["value"], "sec_32": hi["value"],
            "queries_8": lo["queries"], "queries_32": hi["queries"],
            "scaling_efficiency": round(eff, 3),
            "pairs": hi["pairs"], "sf": hi["sf"]}))
        return
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
