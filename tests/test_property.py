"""Property-based (hypothesis) checks: tokenizer parity and join equivalence
on randomized inputs — the randomized analog of the reference's fixed-CSV
matrix (SURVEY.md §5)."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rayssj import QgramTokenizer, WhitespaceTokenizer, jaccard_join
from rayssj import filter_utils as fu
from rayssj.tokenizers import AlphanumericTokenizer

from .oracle import result_pair_set, set_sim_join_oracle
from .test_tokenizers import pure_qgram

texts = st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                max_size=80)


@given(st.lists(texts, max_size=20), st.integers(1, 4), st.booleans(),
       st.booleans())
@settings(max_examples=60, deadline=None)
def test_qgram_batch_parity_random(strings, q, padding, return_set):
    tk = QgramTokenizer(q, padding=padding, return_set=return_set)
    batch = tk.tokenize_batch(strings).to_pylist()
    assert batch == [pure_qgram(s, q, padding, return_set) for s in strings]


@given(st.lists(texts, max_size=20))
@settings(max_examples=40, deadline=None)
def test_ws_and_alnum_batch_parity_random(strings):
    for tk in (WhitespaceTokenizer(), AlphanumericTokenizer()):
        assert tk.tokenize_batch(strings).to_pylist() == \
            [tk.tokenize(s) for s in strings]


word = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
sentence = st.lists(word, min_size=1, max_size=8).map(" ".join)


@pytest.mark.parametrize("threshold", [0.4, 0.7])
def test_join_equivalence_random_tables(threshold):
    from hypothesis import find

    # use hypothesis strategies to synthesize one adversarial-ish table pair
    # deterministically per run, then full-oracle compare (a Ray pipeline per
    # hypothesis example would be too slow — sample a handful)
    import random

    rng = random.Random(threshold)
    words = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    for trial in range(3):
        A = pd.DataFrame({
            "ID": [f"a{i}" for i in range(25)],
            "t": [" ".join(rng.choices(words, k=rng.randint(1, 6)))
                  for _ in range(25)]})
        B = pd.DataFrame({
            "ID": [f"b{i}" for i in range(25)],
            "t": [" ".join(rng.choices(words, k=rng.randint(1, 6)))
                  for _ in range(25)]})
        tok = WhitespaceTokenizer()
        out = jaccard_join(A, B, "ID", "ID", "t", "t", tok, threshold,
                           salt_target=3).to_pandas()
        got = result_pair_set(out, "l_ID", "r_ID")
        exp = set_sim_join_oracle(A, B, "ID", "ID", "t", "t", tok,
                                  fu.JACCARD, threshold)
        assert got == exp, (trial, sorted(got ^ exp)[:4])
