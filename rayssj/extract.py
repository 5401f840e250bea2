"""HTML → text extraction for Common-Crawl-style page tables.

Input schema (BASELINE.json input_hint): (url:string, warc_ts:timestamp,
html:binary, text:string, lang:string). The per-row invariant is BYTE-IDENTICAL
extracted text per url across runs: the extraction function is pure,
deterministic, versioned (EXTRACTOR_VERSION is recorded in lineage manifests —
any change invalidates checkpoints, SURVEY.md §7.4).

Not present in the reference (operates on ready strings); required by the
north_star. Extraction here is a deterministic tag-stripper (no external HTML
libs in this environment): decode utf-8 (errors='replace'), drop
script/style/head blocks, strip tags, unescape the five core entities,
collapse whitespace runs to single spaces, join block-level boundaries with
newlines.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

EXTRACTOR_VERSION = "rayssj-extract-1.0.0"

_SCRIPT_RE = re.compile(rb"<(script|style)\b.*?</\1\s*>", re.S | re.I)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_BLOCK_TAG_RE = re.compile(
    rb"</?(p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|footer|title|body)\b[^>]*>",
    re.I)
_TAG_RE = re.compile(rb"<[^>]+>")
_ENTITIES = [(b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'),
             (b"&#39;", b"'"), (b"&amp;", b"&")]  # &amp; last (standard order)
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\n\s*\n+|\s*\n\s*")


def extract_text(html: bytes) -> str:
    """Pure, deterministic html→text; the byte-identical-per-url contract."""
    if html is None:
        return ""
    b = _COMMENT_RE.sub(b"", html)
    b = _SCRIPT_RE.sub(b"", b)
    b = _BLOCK_TAG_RE.sub(b"\n", b)
    b = _TAG_RE.sub(b" ", b)
    for ent, rep in _ENTITIES:
        b = b.replace(ent, rep)
    s = b.decode("utf-8", errors="replace")
    s = _WS_RE.sub(" ", s)
    s = _NL_RE.sub("\n", s)
    return s.strip()


def extract_batch(batch: pa.Table, html_col: str = "html",
                  text_col: str = "text") -> pa.Table:
    """map_batches stage: fill null/absent ``text`` from ``html``; rows with
    non-null text keep it untouched (the held-out-rows contract, FIXTURES.md F1)."""
    html = batch[html_col].to_pylist()
    if text_col in batch.schema.names:
        text = batch[text_col].to_pylist()
        out = [t if t is not None else extract_text(h)
               for t, h in zip(text, html)]
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, pa.array(out, type=pa.string()))
    out = [extract_text(h) for h in html]
    return batch.append_column(text_col, pa.array(out, type=pa.string()))


def extract_stage(ds, html_col: str = "html", text_col: str = "text",
                  drop_html: bool = True):
    """Dataset stage: derive text, then DROP the wide binary column immediately
    so downstream shuffles move only urls + tokens (SURVEY.md §7.4)."""
    out = ds.map_batches(lambda t: extract_batch(t, html_col, text_col),
                         batch_format="pyarrow", zero_copy_batch=True)
    if drop_html:
        out = out.drop_columns([html_col])
    return out
