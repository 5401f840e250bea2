"""Text-analysis stages for large-scale training-data pipelines (graft
additions beyond reference parity): language-ID, quality scoring, token
counting, document fingerprinting. All are stateless/stateful ``map_batches``
stages over Arrow batches; nothing materializes.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- language id

# tiny deterministic character/stopword profiles (public knowledge); this is a
# heuristic n-gram/stopword scorer, not a trained model
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "se", "del", "las"},
    "de": {"der", "die", "und", "das", "ist", "von", "den", "mit", "für", "auf"},
    "fr": {"le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"},
}
_CJK_RE = re.compile(r"[一-鿿]")
_WORD_RE = re.compile(r"[a-zA-Zäöüéèêàçñ]+")


class LangIdScorer:
    """Actor-pool stage: adds ``lang_pred`` + ``lang_score`` columns.

    Stopword-ratio heuristic with a CJK character fast path; patterns compiled
    once per actor (__init__), batches processed vectorized-per-column.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = _WORD_RE
        self.cjk_re = _CJK_RE
        self.profiles = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        langs, scores = [], []
        for t in texts:
            if not t:
                langs.append("und")
                scores.append(0.0)
                continue
            if len(self.cjk_re.findall(t)) * 2 > len(t) * 0.1:
                langs.append("zh")
                scores.append(1.0)
                continue
            words = [w.lower() for w in self.word_re.findall(t)]
            if not words:
                langs.append("und")
                scores.append(0.0)
                continue
            best, best_score = "und", 0.0
            for lang, sw in self.profiles.items():
                hit = sum(1 for w in words if w in sw) / len(words)
                if hit > best_score:
                    best, best_score = lang, hit
            langs.append(best if best_score > 0 else "und")
            scores.append(round(best_score, 6))
        return (batch.append_column("lang_pred", pa.array(langs, type=pa.string()))
                     .append_column("lang_score", pa.array(scores, type=pa.float64())))


# ------------------------------------------------------------- quality scores

def quality_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized quality features: n_chars, n_tokens, mean token length,
    punctuation ratio, digit ratio, uppercase ratio, stopword ratio."""
    col = batch[text_col]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    filled = col.fill_null("")
    n_chars = pc.utf8_length(filled)
    texts = filled.to_pylist()
    # str.split() semantics (no empty-token artifacts on ""/whitespace)
    n_tokens = pa.array([len(t.split()) for t in texts], type=pa.int32())
    punct = np.zeros(len(texts))
    digit = np.zeros(len(texts))
    upper = np.zeros(len(texts))
    stop = np.zeros(len(texts))
    sw = _LANG_STOPWORDS["en"]
    for i, t in enumerate(texts):
        if not t:
            continue
        L = len(t)
        punct[i] = sum(not c.isalnum() and not c.isspace() for c in t) / L
        digit[i] = sum(c.isdigit() for c in t) / L
        upper[i] = sum(c.isupper() for c in t) / L
        ws = t.lower().split()
        stop[i] = (sum(1 for w in ws if w in sw) / len(ws)) if ws else 0.0
    ntk = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    nch = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    mean_tok_len = np.where(ntk > 0, (nch - np.maximum(ntk - 1, 0)) / np.maximum(ntk, 1), 0.0)
    return (batch.append_column("n_chars", n_chars.cast(pa.int64()))
                 .append_column("n_tokens", n_tokens.cast(pa.int64()))
                 .append_column("mean_token_len", pa.array(mean_tok_len))
                 .append_column("punct_ratio", pa.array(np.round(punct, 6)))
                 .append_column("digit_ratio", pa.array(np.round(digit, 6)))
                 .append_column("upper_ratio", pa.array(np.round(upper, 6)))
                 .append_column("stopword_ratio", pa.array(np.round(stop, 6))))


# -------------------------------------------------------------- token counts

_BPEISH_RE = re.compile(r"\w+|[^\w\s]")


class TokenCounter:
    """Adds ``ws_tokens`` (whitespace count) and ``bpe_tokens`` (regex
    word+punct count — a BPE-ish proxy); regex compiled once per actor."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.re = _BPEISH_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        filled = col.fill_null("")
        ws = pc.list_value_length(pc.utf8_split_whitespace(filled))
        # drop empty-string artifacts from leading/trailing ws
        texts = filled.to_pylist()
        ws_fix = np.array([len(t.split()) for t in texts], dtype=np.int64)
        bpe = np.array([len(self.re.findall(t)) for t in texts], dtype=np.int64)
        return (batch.append_column("ws_tokens", pa.array(ws_fix))
                     .append_column("bpe_tokens", pa.array(bpe)))


# ------------------------------------------------------------- fingerprinting

def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      out_col: str = "fingerprint") -> pa.Table:
    """64-bit content fingerprint (stable polynomial rolling hash over utf-8
    bytes; see checkpoint.stable_hash64). Exact-dup detection key."""
    from rayssj.checkpoint import stable_hash64

    col = batch[text_col]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return batch.append_column(out_col, stable_hash64(col.fill_null("")))
