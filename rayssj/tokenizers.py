"""Tokenizers with py_stringmatching-parity semantics, vectorized for Arrow.

The reference engine takes tokenizer objects from the external
``py_stringmatching`` package (SURVEY.md §2 row 18; reference dep, public API).
We re-implement the five tokenizers used by the reference test matrix with
token-for-token identical output:

- ``QgramTokenizer(qval, padding=True, prefix_pad='#', suffix_pad='$', return_set=False)``
- ``WhitespaceTokenizer(return_set=False)`` — ``str.split()`` semantics
- ``DelimiterTokenizer(delim_set={' '}, return_set=False)``
- ``AlphabeticTokenizer(return_set=False)`` — ``[a-zA-Z]+`` findall
- ``AlphanumericTokenizer(return_set=False)`` — ``[a-zA-Z0-9]+`` findall

``return_set=True`` performs ORDER-PRESERVING dedup (first occurrence wins),
matching py_stringmatching's ``convert_to_set``.

Each tokenizer exposes:
- ``tokenize(s) -> list[str]`` — scalar path (filters' ``filter_pair``, parity tests)
- ``tokenize_batch(arr: pa.Array|list[str]) -> pa.ListArray`` — vectorized batch
  path used inside ``map_batches`` stages (Arrow kernels where possible).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _convert_to_set(tokens: list[str]) -> list[str]:
    seen = set()
    out = []
    for t in tokens:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def _list_parts(list_arr: pa.ListArray):
    """(values, per-row lengths) of a list array, slice-safe (offsets may not start at 0)."""
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    lengths = pc.list_value_length(list_arr).fill_null(0)
    lengths = lengths.to_numpy(zero_copy_only=False).astype(np.int64)
    values = list_arr.flatten()  # respects slicing and nulls
    return values, lengths


def _dedup_list_array(list_arr: pa.ListArray) -> pa.ListArray:
    """Order-preserving per-row dedup of a list<string> array (vectorized).

    Uses numpy lexsort over (row_id, token_code) pairs; preserves
    first-occurrence order within each row.
    """
    values, lengths = _list_parts(list_arr)
    n_rows = len(list_arr)
    n_vals = len(values)
    if n_vals == 0:
        return list_arr
    # dictionary-encode tokens -> int codes (C-speed hashing)
    dict_arr = values.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    pos = np.arange(n_vals, dtype=np.int64)
    # first occurrence of each (row, code): sort by (row, code, pos) and keep firsts
    order = np.lexsort((pos, codes, row_ids))
    r_s, c_s, p_s = row_ids[order], codes[order], pos[order]
    first = np.ones(n_vals, dtype=bool)
    first[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
    keep_pos = np.sort(p_s[first])  # restore original order
    new_vals = values.take(pa.array(keep_pos))
    keep_rows = row_ids[keep_pos]
    counts = np.bincount(keep_rows, minlength=n_rows)
    new_offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=new_offsets[1:])
    return pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()), new_vals)


def batch_overlap_counts(l_list, r_list):
    """Per-row distinct-token overlap between two aligned list<string> arrays.

    Both sides must be per-row deduped (``return_set=True`` tokenization), so
    a (row, token) occurs at most once per side; under a (row, code) sort a
    shared token is exactly one adjacent duplicate. Returns int64 arrays
    ``(overlap, l_sizes, r_sizes)`` — no per-row Python (the round-2
    ``filter_candset`` re-tokenized and intersected per pair; VERDICT r02
    weak #2).
    """
    lv, ln = _list_parts(l_list)
    rv, rn = _list_parts(r_list)
    n = len(ln)
    if len(lv) == 0 or len(rv) == 0:
        return np.zeros(n, dtype=np.int64), ln, rn
    comb = pa.chunked_array([lv, rv]).combine_chunks()
    enc = comb.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), ln),
                           np.repeat(np.arange(n, dtype=np.int64), rn)])
    order = np.lexsort((codes, rows))
    cs, rs = codes[order], rows[order]
    dup = (rs[1:] == rs[:-1]) & (cs[1:] == cs[:-1])
    overlap = np.bincount(rs[1:][dup], minlength=n)
    return overlap.astype(np.int64), ln, rn


def as_string_array(arr) -> pa.Array:
    """Coerce input to one flat string Array. An ALL-null block (e.g. a
    1-row repartition slice of a pandas source whose attr is None) infers
    Arrow type ``null``; cast it to string so fill_null("")/split kernels
    accept it — null semantics are preserved."""
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr, type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    return arr


def _mask_nulls(arr: pa.Array, list_arr: pa.ListArray) -> pa.ListArray:
    """Propagate input nulls to the tokenized list array."""
    if arr.null_count == 0:
        return list_arr
    return pc.if_else(pc.is_valid(arr), list_arr, pa.scalar(None, type=list_arr.type))


class _BaseTokenizer:
    def __init__(self, return_set: bool = False):
        self.return_set = bool(return_set)

    # reference tokenizer protocol [ref: py_stringmatching tokenizer API (H)]
    def get_return_set(self) -> bool:
        return self.return_set

    def set_return_set(self, flag: bool) -> bool:
        self.return_set = bool(flag)
        return True

    def tokenize(self, input_string: str) -> list[str]:
        raise NotImplementedError

    def tokenize_batch(self, arr) -> pa.ListArray:
        """Default batch path: scalar tokenize per row (subclasses vectorize)."""
        arr = as_string_array(arr)
        pylist = arr.to_pylist()
        toks = [None if s is None else self.tokenize(s) for s in pylist]
        return pa.array(toks, type=pa.list_(pa.string()))


class QgramTokenizer(_BaseTokenizer):
    """Character q-gram tokenizer, py_stringmatching-parity (SURVEY.md §2 #18)."""

    def __init__(self, qval: int = 2, padding: bool = True, prefix_pad: str = "#",
                 suffix_pad: str = "$", return_set: bool = False):
        if qval < 1:
            raise AssertionError("qval cannot be less than 1")
        if not isinstance(prefix_pad, str) or len(prefix_pad) != 1:
            raise AssertionError("prefix_pad should be a character")
        if not isinstance(suffix_pad, str) or len(suffix_pad) != 1:
            raise AssertionError("suffix_pad should be a character")
        super().__init__(return_set)
        self.qval = qval
        self.padding = padding
        self.prefix_pad = prefix_pad
        self.suffix_pad = suffix_pad

    def tokenize(self, input_string: str) -> list[str]:
        q = self.qval
        s = input_string
        if self.padding:
            s = self.prefix_pad * (q - 1) + s + self.suffix_pad * (q - 1)
        if len(s) < q:
            return []
        toks = [s[i:i + q] for i in range(len(s) - (q - 1))]
        toks = [t for t in toks if t]  # filter(None, ...) parity
        if self.return_set:
            return _convert_to_set(toks)
        return toks

    def tokenize_batch(self, arr) -> pa.ListArray:
        """Vectorized q-gram extraction over a whole Arrow string column.

        Decodes all rows to one UTF-32 code-point buffer, then builds every
        q-gram with strided numpy slicing — no per-row Python loop.
        """
        arr = as_string_array(arr)
        q = self.qval
        n = len(arr)
        if n == 0:
            return pa.array([], type=pa.list_(pa.string()))
        filled = arr.fill_null("")
        if self.padding:
            filled = pc.binary_join_element_wise(
                pa.scalar(self.prefix_pad * (q - 1)), filled,
                pa.scalar(self.suffix_pad * (q - 1)), "")
        pylist = filled.to_pylist()
        lens = np.array([len(s) for s in pylist], dtype=np.int64)
        big = "".join(pylist)
        cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        ngrams_per_row = np.maximum(lens - (q - 1), 0)
        total = int(ngrams_per_row.sum())
        if total == 0:
            return _mask_nulls(arr, pa.ListArray.from_arrays(
                pa.array(np.zeros(n + 1, dtype=np.int32)),
                pa.array([], type=pa.string())))
        row_of_gram = np.repeat(np.arange(n, dtype=np.int64), ngrams_per_row)
        first_gram = np.zeros(n, dtype=np.int64)
        np.cumsum(ngrams_per_row[:-1], out=first_gram[1:])
        gram_start = starts[row_of_gram] + (np.arange(total, dtype=np.int64)
                                            - first_gram[row_of_gram])
        # (total, q) matrix of code points
        mat = np.ascontiguousarray(
            cp[gram_start[:, None] + np.arange(q, dtype=np.int64)[None, :]])
        if cp.size == 0 or cp.max() < 128:
            # ASCII fast path: code points ARE utf-8 bytes; build the Arrow
            # string array directly from buffers — zero per-gram Python work.
            utf8 = mat.astype(np.uint8).tobytes()
            off = np.arange(0, (total + 1) * q, q, dtype=np.int32)
            values = pa.StringArray.from_buffers(
                total, pa.py_buffer(off.tobytes()), pa.py_buffer(utf8))
        else:
            big_grams = mat.tobytes().decode("utf-32-le")
            values = pa.array([big_grams[i * q:(i + 1) * q] for i in range(total)],
                              type=pa.string())
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(ngrams_per_row, out=offsets[1:])
        out = pa.ListArray.from_arrays(pa.array(offsets), values)
        if self.return_set:
            out = _dedup_list_array(out)
        return _mask_nulls(arr, out)


class WhitespaceTokenizer(_BaseTokenizer):
    """``str.split()`` semantics: split on whitespace runs, no empty tokens."""

    def tokenize(self, input_string: str) -> list[str]:
        toks = input_string.split()
        if self.return_set:
            return _convert_to_set(toks)
        return toks

    def tokenize_batch(self, arr) -> pa.ListArray:
        arr = as_string_array(arr)
        split = pc.utf8_split_whitespace(arr.fill_null(""))
        split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
        # Arrow emits empty tokens at leading/trailing whitespace; str.split() doesn't.
        out = _filter_empty_tokens(split)
        if self.return_set:
            out = _dedup_list_array(out)
        return _mask_nulls(arr, out)


def _filter_empty_tokens(list_arr: pa.ListArray) -> pa.ListArray:
    values, lengths = _list_parts(list_arr)
    if len(values) == 0:
        return list_arr
    keep = pc.greater(pc.utf8_length(values), 0).to_numpy(zero_copy_only=False)
    keep = np.asarray(keep, dtype=bool)
    n_rows = len(list_arr)
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    counts = np.bincount(row_ids[keep], minlength=n_rows)
    new_offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=new_offsets[1:])
    return pa.ListArray.from_arrays(pa.array(new_offsets), values.filter(pa.array(keep)))


class DelimiterTokenizer(_BaseTokenizer):
    """Split on a set of delimiter strings; empty tokens removed."""

    def __init__(self, delim_set=None, return_set: bool = False):
        super().__init__(return_set)
        self.delim_set = set(delim_set) if delim_set is not None else {" "}
        self._regex = re.compile("|".join(re.escape(d) for d in sorted(self.delim_set, key=len, reverse=True)))

    def tokenize(self, input_string: str) -> list[str]:
        toks = [t for t in self._regex.split(input_string) if t]
        if self.return_set:
            return _convert_to_set(toks)
        return toks

    def tokenize_batch(self, arr) -> pa.ListArray:
        """Vectorized: plain split for a single delimiter, RE2 alternation
        (longest-delimiter-first, matching the scalar path) otherwise."""
        arr = as_string_array(arr)
        filled = arr.fill_null("")
        if len(self.delim_set) == 1:
            split = pc.split_pattern(filled, next(iter(self.delim_set)))
        else:
            pat = "|".join(re.escape(d)
                           for d in sorted(self.delim_set, key=len, reverse=True))
            split = pc.split_pattern_regex(filled, pat)
        split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
        out = _filter_empty_tokens(split)
        if self.return_set:
            out = _dedup_list_array(out)
        return _mask_nulls(arr, out)


class _RegexFindallTokenizer(_BaseTokenizer):
    _pattern: str = ""

    def __init__(self, return_set: bool = False):
        super().__init__(return_set)
        self._regex = re.compile(self._pattern)

    def tokenize(self, input_string: str) -> list[str]:
        toks = self._regex.findall(input_string)
        if self.return_set:
            return _convert_to_set(toks)
        return toks

    def tokenize_batch(self, arr) -> pa.ListArray:
        arr = as_string_array(arr)
        split = pc.split_pattern_regex(arr.fill_null(""), self._inverse_pattern)
        split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
        out = _filter_empty_tokens(split)
        if self.return_set:
            out = _dedup_list_array(out)
        return _mask_nulls(arr, out)


class AlphabeticTokenizer(_RegexFindallTokenizer):
    _pattern = "[a-zA-Z]+"
    _inverse_pattern = "[^a-zA-Z]+"


class AlphanumericTokenizer(_RegexFindallTokenizer):
    _pattern = "[a-zA-Z0-9]+"
    _inverse_pattern = "[^a-zA-Z0-9]+"
