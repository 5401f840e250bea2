"""Tokenizer parity: vectorized batch kernels vs scalar reference semantics
(FIXTURES.md F5 adversarial corpus)."""

import pytest

from rayssj.tokenizers import (
    AlphabeticTokenizer,
    AlphanumericTokenizer,
    DelimiterTokenizer,
    QgramTokenizer,
    WhitespaceTokenizer,
)

CORPUS = [
    "", "a", "ab", "abc",
    "  leading  internal   trailing  ",
    "aaaaaa",
    "naïve café",
    "北京 大学",
    "tab\tand\nnewline",
    None,
    "x" * 10000,
    " ".join(["tok"] * 500),
    "mixed 123 alnum-chars_under score",
]


def pure_qgram(s, q, padding, return_set):
    if padding:
        s = "#" * (q - 1) + s + "$" * (q - 1)
    if len(s) < q:
        return []
    toks = [s[i:i + q] for i in range(len(s) - q + 1)]
    if return_set:
        seen, out = set(), []
        for t in toks:
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out
    return toks


@pytest.mark.parametrize("q", [1, 2, 3, 5])
@pytest.mark.parametrize("padding", [True, False])
@pytest.mark.parametrize("return_set", [True, False])
def test_qgram_scalar_semantics(q, padding, return_set):
    tk = QgramTokenizer(q, padding=padding, return_set=return_set)
    for s in CORPUS:
        if s is None:
            continue
        assert tk.tokenize(s) == pure_qgram(s, q, padding, return_set), s[:50]


@pytest.mark.parametrize("mk", [
    lambda rs: QgramTokenizer(2, return_set=rs),
    lambda rs: QgramTokenizer(3, return_set=rs),
    lambda rs: QgramTokenizer(2, padding=False, return_set=rs),
    lambda rs: QgramTokenizer(1, return_set=rs),
    lambda rs: WhitespaceTokenizer(rs),
    lambda rs: AlphabeticTokenizer(rs),
    lambda rs: AlphanumericTokenizer(rs),
    lambda rs: DelimiterTokenizer({",", " "}, return_set=rs),
    lambda rs: DelimiterTokenizer({"##"}, return_set=rs),
    lambda rs: DelimiterTokenizer({"|", "##", "#"}, return_set=rs),
])
@pytest.mark.parametrize("return_set", [True, False])
def test_batch_matches_scalar(mk, return_set):
    tk = mk(return_set)
    batch = tk.tokenize_batch(CORPUS).to_pylist()
    scalar = [None if s is None else tk.tokenize(s) for s in CORPUS]
    assert batch == scalar


def test_whitespace_split_semantics():
    tk = WhitespaceTokenizer()
    assert tk.tokenize("  a\t b\nc  ") == ["a", "b", "c"]
    assert tk.tokenize("") == []
    assert tk.tokenize("   ") == []


def test_delimiter_tokenizer():
    tk = DelimiterTokenizer({",", " "})
    assert tk.tokenize("a,b c,,d ") == ["a", "b", "c", "d"]
    tk2 = DelimiterTokenizer({"##"})
    assert tk2.tokenize("a##b#c") == ["a", "b#c"]


def test_return_set_protocol():
    tk = WhitespaceTokenizer()
    assert tk.get_return_set() is False
    tk.set_return_set(True)
    assert tk.tokenize("a b a") == ["a", "b"]


def test_qgram_validation():
    with pytest.raises(AssertionError):
        QgramTokenizer(0)
    with pytest.raises(AssertionError):
        QgramTokenizer(2, prefix_pad="##")
