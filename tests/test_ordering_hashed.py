"""HashedTokenOrder: distributed (count, token)-order ranks must be
bit-identical to the driver-built TokenOrder, and joins must produce the
exact same results with either."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _tokenized_ds(n_rows=500, vocab=800, seed=7):
    import ray.data as rd

    from rayssj.ordering import TOKENS_COL

    rng = np.random.default_rng(seed)
    words = [f"tok{i:05d}" for i in range(vocab)]
    rows = [list(rng.choice(words, size=rng.integers(3, 12), replace=False))
            for _ in range(n_rows)]
    tbl = pa.table({"key": pa.array(range(n_rows), type=pa.int64()),
                    TOKENS_COL: pa.array(rows, type=pa.list_(pa.string()))})
    return rd.from_arrow(tbl).repartition(8), tbl


def test_hashed_ranks_match_driver():
    from rayssj.ordering import HashedTokenOrder, TokenOrder, build_token_order

    ds, tbl = _tokenized_ds()
    driver = build_token_order(ds, mode="driver")
    hashed = build_token_order(ds, mode="hashed")
    assert isinstance(driver, TokenOrder) and isinstance(hashed, HashedTokenOrder)
    assert len(driver) == len(hashed)
    assert (driver.n_empty, driver.n_missing) == (hashed.n_empty, hashed.n_missing)

    from rayssj.ordering import TOKENS_COL

    rv_d, cv_d, len_d = driver.encode(tbl[TOKENS_COL])
    rv_h, cv_h, len_h = hashed.encode(tbl[TOKENS_COL])
    np.testing.assert_array_equal(rv_d, rv_h)
    np.testing.assert_array_equal(cv_d, cv_h)
    np.testing.assert_array_equal(len_d, len_h)


def test_auto_mode_switches_on_threshold():
    from rayssj.ordering import HashedTokenOrder, TokenOrder, build_token_order

    ds, _ = _tokenized_ds(n_rows=200, vocab=300)
    assert isinstance(build_token_order(ds), TokenOrder)
    assert isinstance(build_token_order(ds, hashed_threshold=10),
                      HashedTokenOrder)


def test_join_identical_with_hashed_order():
    import ray.data as rd

    from rayssj.joins import _set_sim_join, _tokenize_stage, _clone_tokenizer
    from rayssj.ordering import build_token_order
    from rayssj.tokenizers import WhitespaceTokenizer

    rng = np.random.default_rng(21)
    words = [f"w{i}" for i in range(60)]
    texts = [" ".join(rng.choice(words, size=8, replace=False))
             for _ in range(120)]
    texts[10] = texts[0]
    df = pd.DataFrame({"doc_id": range(120), "text": texts})
    ds = rd.from_pandas(df)

    def run(order):
        out = _set_sim_join(ds, None, "doc_id", "doc_id", "text", "text",
                            WhitespaceTokenizer(), "JACCARD", 0.6,
                            self_join=True, token_order=order).to_pandas()
        return out.sort_values(["l_doc_id", "r_doc_id"], ignore_index=True)

    tok = _tokenize_stage(ds, "doc_id", "text",
                          _clone_tokenizer(WhitespaceTokenizer(), True),
                          keep_string=False)
    hashed = build_token_order(tok, mode="hashed")
    base = run(None)  # default driver-built ordering
    via_hashed = run(hashed)
    pd.testing.assert_frame_equal(base, via_hashed)
    assert len(base) > 0
