"""Cluster-quality gate (BASELINE.md row 1): flagship pipeline on the
entity-labeled page fixture must reach pairwise F1 >= 0.99."""

import numpy as np
import pandas as pd
import pytest


def test_pairwise_f1_gate():
    import ray.data as rd

    from rayssj.cluster import connected_components
    from rayssj.extract import extract_stage
    from rayssj.fixtures import make_pages, pairwise_f1
    from rayssj.joins import jaccard_join
    from rayssj.tokenizers import WhitespaceTokenizer

    pages = make_pages(n_entities=120, seed=42)
    truth = dict(zip(pages["url"], pages["entity_id"]))
    # rows with null html AND null text can't be linked; exclude from truth
    dead = pages[pages["html"].isna() & pages["text"].isna()]["url"]
    for u in dead:
        truth.pop(u)

    ds = rd.from_pandas(pages.drop(columns=["entity_id"]))
    extracted = extract_stage(ds)
    pairs = jaccard_join(extracted, None, "url", "url", "text", "text",
                         WhitespaceTokenizer(), 0.6, self_join=True)
    comps = connected_components(pairs, "l_url", "r_url").to_pandas()
    pred = dict(zip(comps["node"], comps["component"]))

    prec, rec, f1 = pairwise_f1(pred, truth)
    assert f1 >= 0.99, (prec, rec, f1)


def test_extract_holdout_byte_identical():
    """The 20% held-out rows must get text derived from html that is
    byte-identical to what the generator embedded (per-row invariant,
    BASELINE.json input_hint)."""
    import ray.data as rd

    from rayssj.extract import extract_stage
    from rayssj.fixtures import make_pages

    pages = make_pages(n_entities=30, seed=7)
    ds = rd.from_pandas(pages.drop(columns=["entity_id"]))
    out = extract_stage(ds).to_pandas().set_index("url")
    # run twice: determinism
    out2 = extract_stage(rd.from_pandas(pages.drop(columns=["entity_id"])))\
        .to_pandas().set_index("url")
    assert (out["text"].fillna("∅") == out2.loc[out.index, "text"].fillna("∅")).all()
    # held-out rows (rid%5==0): extracted text == title + "\n" + body
    for _, row in pages.iterrows():
        if row["text"] is None and row["html"] is not None:
            rid = int(row["url"].rsplit("/", 1)[-1])
            extracted = out.loc[row["url"], "text"]
            assert extracted.startswith(f"p{rid}\n") or extracted == f"p{rid}", extracted


def test_distributed_label_propagation_matches_union_find():
    """Force the distributed min-label-propagation path (driver_threshold=0)
    and compare against the driver union-find fast path."""
    import pandas as pd

    from rayssj.cluster import connected_components

    edges = pd.DataFrame({
        "a": [1, 2, 3, 10, 11, 20, 1, 30],
        "b": [2, 3, 4, 11, 12, 21, 4, 31],
    })
    fast = connected_components(edges, "a", "b").to_pandas()
    dist = connected_components(edges, "a", "b", driver_threshold=0).to_pandas()
    f = dict(zip(fast["node"], fast["component"]))
    d = dict(zip(dist["node"], dist["component"]))
    assert f == d
    assert f[4] == 1 and f[12] == 10 and f[21] == 20 and f[31] == 30


def test_vectorized_driver_path_chain_strings_and_scale():
    """The vectorized driver loop (pointer jumping over rank labels) must
    close a deep chain (worst diameter), handle string node ids, and agree
    with the distributed path on a random graph."""
    import numpy as np
    import pandas as pd

    from rayssj.cluster import connected_components

    # 200-node chain of string ids with shuffled edge order: component of
    # every node is the lexicographic min ("n000")
    ids = [f"n{i:03d}" for i in range(200)]
    rng = np.random.default_rng(7)
    order = rng.permutation(199)
    chain = pd.DataFrame({"a": [ids[i] for i in order],
                          "b": [ids[i + 1] for i in order]})
    out = connected_components(chain, "a", "b").to_pandas()
    assert set(out["component"]) == {"n000"} and len(out) == 200

    # random int graph: vectorized driver path == distributed path
    a = rng.integers(0, 500, 3000)
    b = rng.integers(0, 500, 3000)
    g = pd.DataFrame({"a": a, "b": b})
    fast = connected_components(g, "a", "b").to_pandas()
    dist = connected_components(g, "a", "b", driver_threshold=0).to_pandas()
    assert (dict(zip(fast["node"], fast["component"]))
            == dict(zip(dist["node"], dist["component"])))


def test_offdriver_finish_100k_edges():
    """VERDICT r04 next #2 done-criterion: driver_threshold=1000 on a
    100 k-edge graph — contraction + symmetric fixpoint must finish the
    residual star set off-driver and agree with the driver fast path."""
    import warnings as _w

    import numpy as np
    import pandas as pd

    from rayssj.cluster import connected_components

    rng = np.random.default_rng(11)
    n_nodes = 40_000
    g = pd.DataFrame({"a": rng.integers(0, n_nodes, 100_000),
                      "b": rng.integers(0, n_nodes, 100_000)})
    fast = connected_components(g, "a", "b").to_pandas()  # 100k < default cap
    with _w.catch_warnings():
        # the distributed run must never take the warned driver pull
        _w.filterwarnings("error", message="connected_components: no fixpoint")
        dist = connected_components(g, "a", "b",
                                    driver_threshold=1000).to_pandas()
    assert (dict(zip(fast["node"], fast["component"]))
            == dict(zip(dist["node"], dist["component"])))


def test_symmetric_fixpoint_structures():
    """The symmetric-fixpoint criterion (count+checksum stable ⇒ exact stars)
    must label chains, cliques, multi-parent stars and isolated self-loops
    correctly with driver_threshold=0 (every edge set 'too big' for the
    driver) — and never fall through to the warned driver pull."""
    import warnings as _w

    import numpy as np
    import pandas as pd

    from rayssj.cluster import connected_components

    rng = np.random.default_rng(3)
    edges = []
    # deep chain 0..99
    edges += [(i, i + 1) for i in range(99)]
    # clique on 200..219 (dense multi-parent)
    cl = list(range(200, 220))
    edges += [(x, y) for x in cl for y in cl if x < y]
    # star with high-id root listed first (order must not matter)
    edges += [(300, t) for t in range(301, 340)]
    # self-loop singleton + duplicate edges
    edges += [(400, 400), (0, 1), (0, 1)]
    # random blob
    ra = rng.integers(500, 700, 400)
    rb = rng.integers(500, 700, 400)
    edges += list(zip(ra.tolist(), rb.tolist()))
    g = pd.DataFrame(edges, columns=["a", "b"])

    fast = connected_components(g, "a", "b").to_pandas()
    with _w.catch_warnings():
        _w.filterwarnings("error", message="connected_components: no fixpoint")
        dist = connected_components(g, "a", "b",
                                    driver_threshold=0).to_pandas()
    f = dict(zip(fast["node"], fast["component"]))
    d = dict(zip(dist["node"], dist["component"]))
    assert f == d
    assert d[99] == 0 and d[219] == 200 and d[339] == 300 and d[400] == 400


def test_symmetric_fixpoint_string_ids():
    """The linkage pipeline clusters by URL: the distributed fixpoint path
    (including the groupby(node).min(component) label emission) must handle
    string node ids."""
    import warnings as _w

    import numpy as np
    import pandas as pd

    from rayssj.cluster import connected_components

    rng = np.random.default_rng(9)
    ids = [f"https://example.com/doc/{i:04d}" for i in range(300)]
    a = rng.integers(0, 300, 1200)
    b = rng.integers(0, 300, 1200)
    g = pd.DataFrame({"a": [ids[i] for i in a], "b": [ids[j] for j in b]})
    fast = connected_components(g, "a", "b").to_pandas()
    with _w.catch_warnings():
        _w.filterwarnings("error", message="connected_components: no fixpoint")
        dist = connected_components(g, "a", "b",
                                    driver_threshold=0).to_pandas()
    assert (dict(zip(fast["node"], fast["component"]))
            == dict(zip(dist["node"], dist["component"])))


def test_maxrounds_exhaustion_warns_and_is_correct():
    """max_rounds too small to reach fixpoint: the driver pull must warn with
    the measured residual size (ADVICE r04 #1) and still return the right
    labels."""
    import numpy as np
    import pandas as pd
    import pytest

    from rayssj.cluster import connected_components

    rng = np.random.default_rng(5)
    g = pd.DataFrame({"a": rng.integers(0, 2_000, 10_000),
                      "b": rng.integers(0, 2_000, 10_000)})
    fast = connected_components(g, "a", "b").to_pandas()
    with pytest.warns(RuntimeWarning, match="no fixpoint after 1 rounds"):
        dist = connected_components(g, "a", "b", driver_threshold=0,
                                    max_rounds=1).to_pandas()
    assert (dict(zip(fast["node"], fast["component"]))
            == dict(zip(dist["node"], dist["component"])))
