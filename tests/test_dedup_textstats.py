"""Dedup family + text-analysis stages (graft additions)."""

import numpy as np
import pandas as pd
import pytest


def _docs_df(n=60, seed=3):
    rng = np.random.default_rng(seed)
    words = [f"t{i}" for i in range(40)]
    texts = []
    for i in range(n):
        base = " ".join(rng.choice(words, size=12, replace=False))
        texts.append(base)
    # exact dupes
    texts[10] = texts[0]
    texts[11] = texts[0]
    # near dupe (one word changed)
    texts[12] = texts[1].rsplit(" ", 1)[0] + " zzz"
    return pd.DataFrame({"doc_id": range(n), "text": texts})


def test_exact_dedup():
    import ray.data as rd

    from rayssj.dedup import exact_dedup

    df = _docs_df()
    out = exact_dedup(rd.from_pandas(df), "text", "doc_id").to_pandas()
    assert len(out) == len(df) - 2
    assert 0 in set(out["doc_id"]) and 10 not in set(out["doc_id"])


def test_minhash_estimates_jaccard():
    from rayssj.dedup import MinHasher, _shingle_hashes
    from rayssj.filter_utils import jaccard

    mh = MinHasher(num_perm=128, shingle_k=3)
    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox jumped over the lazy dog"
    sa, _ = _shingle_hashes([a], 3)
    sb, _ = _shingle_hashes([b], 3)
    est = (mh.minhash(sa[0]) == mh.minhash(sb[0])).mean()
    true = len(np.intersect1d(sa[0], sb[0])) / len(np.union1d(sa[0], sb[0]))
    assert abs(est - true) < 0.15


def test_minhash_lsh_finds_near_dupes():
    import ray.data as rd

    from rayssj.dedup import minhash_lsh_pairs

    df = _docs_df()
    pairs = minhash_lsh_pairs(rd.from_pandas(df), "doc_id", "text",
                              jaccard_threshold=0.9).to_pandas()
    found = set(zip(pairs["l_doc_id"], pairs["r_doc_id"]))
    assert (0, 10) in found and (0, 11) in found and (10, 11) in found


def test_minhash_lsh_pairs_are_unique():
    """First-colliding-band emission must yield each pair exactly once with
    no second dedup shuffle (the round-1 crash site)."""
    import ray.data as rd

    from rayssj.dedup import minhash_lsh_pairs

    df = _docs_df()
    pairs = minhash_lsh_pairs(rd.from_pandas(df), "doc_id", "text",
                              jaccard_threshold=0.5).to_pandas()
    keys = list(zip(pairs["l_doc_id"], pairs["r_doc_id"]))
    assert len(keys) == len(set(keys))
    assert all(l < r for l, r in keys)


def test_minhash_lsh_exact_verify():
    """verify='exact' scores true shingle-set Jaccard, so every emitted pair
    meets the nominal threshold exactly (checked against brute force)."""
    import ray.data as rd

    from rayssj.dedup import _shingle_hashes, minhash_lsh_pairs

    df = _docs_df()
    pairs = minhash_lsh_pairs(rd.from_pandas(df), "doc_id", "text",
                              jaccard_threshold=0.8, verify="exact").to_pandas()
    sh, _ = _shingle_hashes(list(df["text"]), 5)

    def true_jac(a, b):
        inter = np.intersect1d(sh[a], sh[b], assume_unique=True).size
        return inter / (sh[a].size + sh[b].size - inter)

    assert len(pairs) > 0
    for l, r, s in zip(pairs["l_doc_id"], pairs["r_doc_id"], pairs["_sim_score"]):
        assert abs(s - true_jac(l, r)) < 1e-6
        assert s >= 0.8
    # the two exact-dup pairs must be found with true score 1.0
    found = dict(zip(zip(pairs["l_doc_id"], pairs["r_doc_id"]), pairs["_sim_score"]))
    assert found[(0, 10)] == 1.0 and found[(0, 11)] == 1.0
    keys = list(zip(pairs["l_doc_id"], pairs["r_doc_id"]))
    assert len(keys) == len(set(keys))


def test_minhash_dedup_drops_losers_distributed():
    import ray.data as rd

    from rayssj.dedup import minhash_dedup

    df = _docs_df()
    out = minhash_dedup(rd.from_pandas(df), "doc_id", "text",
                        jaccard_threshold=0.9).to_pandas()
    ids = set(out["doc_id"])
    assert 0 in ids and 10 not in ids and 11 not in ids
    assert set(out.columns) == {"doc_id", "text"}


def test_simhash_pairs_unique_and_composable():
    """Pairs unique without a dedup shuffle AND the pair stream survives a
    downstream shuffle (zero-schema empty blocks scrubbed)."""
    import ray.data as rd

    from rayssj.cluster import connected_components
    from rayssj.dedup import simhash_pairs

    df = _docs_df()
    pairs = simhash_pairs(rd.from_pandas(df), "doc_id", "text", max_hamming=3)
    comps = connected_components(pairs, "l_doc_id", "r_doc_id").to_pandas()
    assert set(comps[comps["component"] == 0]["node"]) >= {0, 10, 11}
    pdf = pairs.to_pandas()
    keys = list(zip(pdf["l_doc_id"], pdf["r_doc_id"]))
    assert len(keys) == len(set(keys))


def test_embedding_grid_matches_bruteforce():
    """Default grid path is EXACT: same pair set as whole-matrix numpy."""
    import ray.data as rd

    from rayssj.dedup import embedding_cosine_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal((80, 16)).astype(np.float32)
    for a, b in [(3, 7), (20, 21), (50, 77)]:
        base[b] = base[a] + rng.standard_normal(16).astype(np.float32) * 0.01
    df = pd.DataFrame({"vec_id": range(80),
                       "embedding": [list(map(float, v)) for v in base]})
    out = embedding_cosine_pairs(rd.from_pandas(df), "vec_id", "embedding",
                                 threshold=0.9, grid_cells=5).to_pandas()
    got = set(zip(out["l_vec_id"], out["r_vec_id"]))
    normed = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = normed @ normed.T
    iu, ju = np.nonzero(np.triu(sims >= 0.9, k=1))
    expect = set(zip(iu.tolist(), ju.tolist()))
    assert got == expect and len(got) == len(out)


def test_simhash_pairs_exact_dupes():
    import ray.data as rd

    from rayssj.dedup import simhash_pairs

    df = _docs_df()
    pairs = simhash_pairs(rd.from_pandas(df), "doc_id", "text",
                          max_hamming=3).to_pandas()
    found = set(zip(pairs["l_doc_id"], pairs["r_doc_id"]))
    assert (0, 10) in found and (0, 11) in found


def test_embedding_cosine_pairs_exact_vs_bucketed():
    import ray.data as rd

    from rayssj.dedup import embedding_cosine_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    base[7] = base[3] + rng.standard_normal(16).astype(np.float32) * 0.01
    df = pd.DataFrame({"vec_id": range(30), "embedding": [list(map(float, v)) for v in base]})
    exact = embedding_cosine_pairs(rd.from_pandas(df), "vec_id", "embedding",
                                   threshold=0.95, num_buckets=1).to_pandas()
    got = set(zip(exact["l_vec_id"], exact["r_vec_id"]))
    assert (3, 7) in got
    # bucketed variant is a subset (approximate path)
    lsh = embedding_cosine_pairs(rd.from_pandas(df), "vec_id", "embedding",
                                 threshold=0.95, num_buckets=4).to_pandas()
    assert set(zip(lsh["l_vec_id"], lsh["r_vec_id"])) <= got


def test_ann_topk_matches_bruteforce():
    import ray.data as rd

    from rayssj.ann import knn_cosine

    rng = np.random.default_rng(9)
    emb = rng.standard_normal((100, 16)).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(100),
                       "embedding": [list(map(float, v)) for v in emb]})
    q = emb[:3]
    out = knn_cosine(rd.from_pandas(df), q, "vec_id", "embedding", k=5).to_pandas()
    normed = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ normed.T
    for qi in range(3):
        expect = set(np.argsort(-sims[qi])[:5].tolist())
        got = set(out[out["query_id"] == qi]["key"])
        assert got == expect


def test_ann_ivf_recall():
    """IVF probes a subset of centroid cells; with full probing it is exact,
    with partial probing recall stays high on clustered data."""
    import ray.data as rd

    from rayssj.ann import knn_cosine, knn_cosine_ivf

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 4
    emb = np.concatenate([c + rng.standard_normal((40, 16)).astype(np.float32)
                          for c in centers])
    df = pd.DataFrame({"vec_id": range(len(emb)),
                       "embedding": [list(map(float, v)) for v in emb]})
    ds = rd.from_pandas(df)
    q = emb[[3, 50, 200]]
    exact = knn_cosine(ds, q, "vec_id", "embedding", k=5).to_pandas()
    full = knn_cosine_ivf(ds, q, "vec_id", "embedding", k=5, n_centroids=8,
                          n_probe=8, sample_size=500).to_pandas()
    pd.testing.assert_frame_equal(
        exact.sort_values(["query_id", "key"], ignore_index=True),
        full.sort_values(["query_id", "key"], ignore_index=True))
    part = knn_cosine_ivf(ds, q, "vec_id", "embedding", k=5, n_centroids=8,
                          n_probe=3, sample_size=500).to_pandas()
    hits = 0
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["key"])
        p = set(part[part["query_id"] == qi]["key"])
        hits += len(e & p)
    assert hits >= 12  # >= 80% recall with 3/8 cells probed


def test_quality_and_token_stats():
    import pyarrow as pa

    from rayssj.textstats import TokenCounter, quality_stats_batch

    batch = pa.table({"doc_id": [1, 2, 3],
                      "text": ["Hello, World 42!", "", None]})
    out = quality_stats_batch(batch)
    assert out["n_chars"].to_pylist() == [16, 0, 0]
    assert out["n_tokens"].to_pylist() == [3, 0, 0]
    assert out["digit_ratio"].to_pylist()[0] == round(2 / 16, 6)
    tc = TokenCounter()
    out2 = tc(batch)
    assert out2["ws_tokens"].to_pylist() == [3, 0, 0]
    assert out2["bpe_tokens"].to_pylist() == [5, 0, 0]  # hello , world 42 !


def test_langid_en():
    import pyarrow as pa

    from rayssj.textstats import LangIdScorer

    s = LangIdScorer()
    out = s(pa.table({"text": ["the cat and the dog in the house",
                               "el perro y la casa de los gatos", ""]}))
    assert out["lang_pred"].to_pylist()[0] == "en"
    assert out["lang_pred"].to_pylist()[1] == "es"
    assert out["lang_pred"].to_pylist()[2] == "und"


def test_fingerprint_stability():
    import pyarrow as pa

    from rayssj.textstats import fingerprint_batch

    b1 = fingerprint_batch(pa.table({"text": ["abc", "abd", "abc"]}))
    fp = b1["fingerprint"].to_pylist()
    assert fp[0] == fp[2] and fp[0] != fp[1]


def test_embedding_multiprobe_lsh_recall():
    """Planted near-dup fixture: multi-probe LSH recall >= 0.9 at t=0.95,
    precision 1.0 (cosine verified in-bucket), and pairs globally unique."""
    import ray.data as rd

    from rayssj.dedup import embedding_cosine_pairs

    rng = np.random.default_rng(13)
    n_base, dim = 900, 16
    base = rng.standard_normal((n_base, dim)).astype(np.float32)
    dups = base[:150] + rng.standard_normal((150, dim)).astype(np.float32) * 0.05
    vecs = np.vstack([base, dups])
    df = pd.DataFrame({"vec_id": range(len(vecs)),
                       "embedding": [list(map(float, v)) for v in vecs]})
    normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = normed @ normed.T
    iu, ju = np.nonzero(np.triu(sims >= 0.95, k=1))
    exact = set(zip(iu.tolist(), ju.tolist()))
    assert len(exact) >= 100

    lsh = embedding_cosine_pairs(rd.from_pandas(df), "vec_id", "embedding",
                                 threshold=0.95, num_buckets=64).to_pandas()
    got = list(zip(lsh["l_vec_id"], lsh["r_vec_id"]))
    assert len(got) == len(set(got))            # no duplicate emissions
    assert set(got) <= exact                    # precision 1.0
    recall = len(set(got) & exact) / len(exact)
    assert recall >= 0.9, recall


def test_embedding_auto_switches_to_lsh():
    """Above auto_exact_max the default path must take the LSH branch and
    still find planted near-dups."""
    import ray.data as rd

    from rayssj.dedup import embedding_cosine_pairs

    rng = np.random.default_rng(17)
    base = rng.standard_normal((300, 16)).astype(np.float32)
    base[250:] = base[:50] + rng.standard_normal((50, 16)).astype(np.float32) * 0.01
    df = pd.DataFrame({"vec_id": range(300),
                       "embedding": [list(map(float, v)) for v in base]})
    out = embedding_cosine_pairs(rd.from_pandas(df), "vec_id", "embedding",
                                 threshold=0.95, auto_exact_max=100).to_pandas()
    got = set(zip(out["l_vec_id"], out["r_vec_id"]))
    planted = {(i, 250 + i) for i in range(50)}
    assert len(got & planted) >= 45
