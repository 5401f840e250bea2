"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship record-linkage pipeline (synthesize pages →
extract text → jaccard self-join → transitive clustering) on sf0.001.
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver cross-checks at
sf0.01. Ray is initialised by the driver — nothing here calls ray.init().

Float parity note: engine similarity math is float64 with the same expression
shape as the SQL (e.g. ``o / (n1 + n2 - o)``), so value hashes match
bit-for-bit; size-bound formulas replicate the engine's 1e-9 ceil/floor guard.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

_EN_STOP = ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def _embs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


# --------------------------------------------------------------------- joins


def _set_join(measure_fn, threshold, tokenizer=None, **kw):
    def run(sf_dir: str):
        from rayssj.tokenizers import WhitespaceTokenizer

        tok = tokenizer or WhitespaceTokenizer()
        return measure_fn(_docs(sf_dir), None, "doc_id", "doc_id", "text",
                          "text", tok, threshold, self_join=True, **kw)

    return run


def _q_edit_distance(sf_dir: str):
    import pyarrow.compute as pc

    from rayssj.joins import edit_distance_join
    from rayssj.tokenizers import QgramTokenizer

    ds = _docs(sf_dir).map_batches(
        lambda t: t.set_column(t.schema.get_field_index("text"), "text",
                               pc.utf8_slice_codeunits(t["text"], 0, 40)),
        batch_format="pyarrow")
    return edit_distance_join(ds, None, "doc_id", "doc_id", "text", "text",
                              QgramTokenizer(2), 3, self_join=True)


# ------------------------------------------------------------ filters/matcher


def _q_overlap_filter(sf_dir: str):
    from rayssj.filters import OverlapFilter
    from rayssj.tokenizers import WhitespaceTokenizer

    f = OverlapFilter(WhitespaceTokenizer(), overlap_size=25)
    return f.filter_tables(_docs(sf_dir), None, "doc_id", "doc_id", "text",
                           "text", self_join=True)


def _q_prefix_filter(sf_dir: str):
    from rayssj.filters import PrefixFilter
    from rayssj.tokenizers import WhitespaceTokenizer

    f = PrefixFilter(WhitespaceTokenizer(), "JACCARD", 0.9)
    return f.filter_tables(_docs(sf_dir), None, "doc_id", "doc_id", "text",
                           "text", self_join=True)


def _q_position_filter(sf_dir: str):
    from rayssj.filters import PositionFilter
    from rayssj.tokenizers import WhitespaceTokenizer

    f = PositionFilter(WhitespaceTokenizer(), "JACCARD", 0.9)
    return f.filter_tables(_docs(sf_dir), None, "doc_id", "doc_id", "text",
                           "text", self_join=True)


def _q_size_filter(sf_dir: str):
    from rayssj.filters import SizeFilter
    from rayssj.tokenizers import WhitespaceTokenizer

    f = SizeFilter(WhitespaceTokenizer(), "JACCARD", 0.9)
    return f.filter_tables(_docs(sf_dir), None, "doc_id", "doc_id", "text",
                           "text", self_join=True)


def _q_suffix_filter(sf_dir: str):
    """Prefix-blocked candidates refined by the PPJoin+ suffix Hamming bound.
    The recursive depth-bounded bound isn't SQL-expressible (rows-only check);
    completeness vs the exact join is property-tested in pytest."""
    from rayssj.filters import SuffixFilter
    from rayssj.tokenizers import WhitespaceTokenizer

    f = SuffixFilter(WhitespaceTokenizer(), "JACCARD", 0.9)
    return f.filter_tables(_docs(sf_dir), None, "doc_id", "doc_id", "text",
                           "text", self_join=True)


def _q_apply_matcher(sf_dir: str):
    from rayssj.filters import OverlapFilter
    from rayssj.matcher import apply_matcher
    from rayssj.filter_utils import jaccard
    from rayssj.tokenizers import WhitespaceTokenizer

    docs = _docs(sf_dir)
    tok = WhitespaceTokenizer()
    cand = OverlapFilter(tok, overlap_size=25).filter_tables(
        docs, None, "doc_id", "doc_id", "text", "text", self_join=True)
    return apply_matcher(cand, "l_doc_id", "r_doc_id", docs, docs,
                         "doc_id", "doc_id", "text", "text",
                         WhitespaceTokenizer(), jaccard, 0.8)


def _q_profile(sf_dir: str):
    from rayssj.profiler import profile_table_for_join

    prof = profile_table_for_join(_docs(sf_dir, ("doc_id", "text", "lang")))
    out = prof.reset_index()[["Attribute", "Unique values", "Missing values"]]
    return out.rename(columns={"Attribute": "attr",
                               "Unique values": "n_unique",
                               "Missing values": "n_missing"})


# ------------------------------------------------------------- graft queries


def _q_exact_dedup(sf_dir: str):
    from rayssj.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir), "text", "doc_id")


def _q_token_counts(sf_dir: str):
    from rayssj.textstats import TokenCounter

    return (_docs(sf_dir)
            .map_batches(TokenCounter(text_col="text"), batch_format="pyarrow")
            .select_columns(["doc_id", "ws_tokens", "bpe_tokens"]))


def _q_quality(sf_dir: str):
    from rayssj.textstats import quality_stats_batch

    return (_docs(sf_dir)
            .map_batches(quality_stats_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "n_chars", "n_tokens", "mean_token_len"]))


def _q_langid(sf_dir: str):
    from rayssj.textstats import LangIdScorer

    return (_docs(sf_dir)
            .map_batches(LangIdScorer(), batch_format="pyarrow")
            .select_columns(["doc_id", "lang_pred", "lang_score"]))


def _q_fingerprint(sf_dir: str):
    from rayssj.textstats import fingerprint_batch

    return (_docs(sf_dir)
            .map_batches(fingerprint_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "fingerprint"]))


def _q_minhash_pairs(sf_dir: str):
    from rayssj.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), "doc_id", "text",
                             jaccard_threshold=0.9)


def _q_minhash_exact(sf_dir: str):
    """LSH-banded candidates verified with TRUE shingle-set Jaccard; with
    bands=32/r=2 the banding miss probability at s>=0.8 is <1e-14, so the
    result equals the exact all-pairs SQL oracle."""
    from rayssj.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), "doc_id", "text", num_perm=64,
                             bands=32, shingle_k=5, jaccard_threshold=0.8,
                             verify="exact")


def _q_simhash_pairs(sf_dir: str):
    from rayssj.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir), "doc_id", "text", max_hamming=3)


def _q_embedding_pairs(sf_dir: str):
    from rayssj.dedup import embedding_cosine_pairs

    out = embedding_cosine_pairs(_embs(sf_dir), "vec_id", "embedding",
                                 threshold=0.4, num_buckets=1)
    # drop score: float32-source cosine last-ulp differences vs DuckDB would
    # break the value-hash; pair identity is the contract here
    return out.select_columns(["l_vec_id", "r_vec_id"])


def _q_ann_topk(sf_dir: str):
    from rayssj.ann import knn_cosine

    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    queries = np.array(emb["embedding"].to_pylist()[:5], dtype=np.float32)
    out = knn_cosine(_embs(sf_dir), queries, "vec_id", "embedding", k=10)
    return out.select_columns(["query_id", "key"])


def _q_ann_ivf(sf_dir: str):
    """IVF ANN with FULL probing (n_probe == n_centroids): exact by
    construction, so the brute-force SQL oracle verifies the whole IVF
    machinery (k-means training, cell assignment, prefilter, scoring).
    Partial probing — the actual scale knob — is recall-tested in pytest."""
    from rayssj.ann import knn_cosine_ivf

    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    queries = np.array(emb["embedding"].to_pylist()[:5], dtype=np.float32)
    out = knn_cosine_ivf(_embs(sf_dir), queries, "vec_id", "embedding", k=10,
                         n_centroids=16, n_probe=16, sample_size=2000)
    return out.select_columns(["query_id", "key"])


def _q_media_features(sf_dir: str):
    """Multimodal plumbing: documents text bytes as opaque media payloads →
    stubbed decode/feature/resize stages (schema + batching are real)."""
    import pyarrow.compute as pc

    from rayssj.multimodal import media_pipeline

    ds = _docs(sf_dir).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "image": pc.cast(t["text"], pa.binary()),
        }), batch_format="pyarrow")
    out = media_pipeline(ds, image_col="image", batch_size=64)
    return (out.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "image_width": t["image_width"],
            "image_height": t["image_height"],
            "n_feat": pc.cast(pc.list_value_length(t["image_feat"]),
                              pa.int64()),
            "small_len": pc.cast(pc.binary_length(t["image_small"]),
                                 pa.int64()),
        }), batch_format="pyarrow"))


def _q_media_features_real(sf_dir: str):
    """Real decode path: synthesize one solid-color binary PPM per doc
    (deterministic in the text's byte length), decode it with the built-in
    pure-numpy P6 codec inside the actor-pool stage, and emit the decoded
    raster dims + the (uniform) grid feature as an integer milli-gray. Every
    output value is independently recomputable in SQL from the same length
    parameterization — a full decode→feature oracle, not just plumbing."""
    import pyarrow.compute as pc

    from rayssj.multimodal import ImageFeatureExtractor

    def make(t: pa.Table) -> pa.Table:
        lens = (pc.binary_length(pc.cast(t["text"], pa.binary()))
                .to_numpy(zero_copy_only=False).astype(np.int64))
        imgs = []
        for L in lens:
            w, h, c = int(L % 37 + 4), int(L % 23 + 4), int(L % 256)
            imgs.append(b"P6\n%d %d\n255\n" % (w, h) + bytes([c]) * (w * h * 3))
        return pa.table({"doc_id": t["doc_id"],
                         "image": pa.array(imgs, type=pa.binary())})

    out = (_docs(sf_dir)
           .map_batches(make, batch_format="pyarrow")
           .map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                        batch_size=64, concurrency=2,
                        fn_constructor_kwargs=dict(col="image", dim=16,
                                                   decoder="real"),
                        max_restarts=0))
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "image_width": t["image_width"],
            "image_height": t["image_height"],
            "gray_milli": pc.cast(
                pc.round(pc.multiply(pc.list_element(t["image_feat"], 0),
                                     1000.0)), pa.int64()),
        }), batch_format="pyarrow")


def _q_media_features_png(sf_dir: str):
    """Built-in PNG decode path (VERDICT r04 next #3): synthesize one
    horizontal-gradient PNG per doc — pixel(y, x) = (c + x) % 256 gray with
    c = byte-length % 256 — cycling scanline filters 0-4 and rotating the
    color type gray/RGB/palette by doc, decode it with the built-in
    stdlib-zlib codec inside the actor-pool stage, and emit the raster dims
    plus two grid features as integer milli-grays (grid x=0 → c, x=w-1 →
    (c+w-1) % 256). Every output value is recomputable in SQL from the
    length parameterization, so the DuckDB value-hash oracle covers inflate
    + unfiltering (all five filters) + palette/gray/RGB conversion + the
    feature grid end-to-end."""
    import pyarrow.compute as pc

    from rayssj.multimodal import ImageFeatureExtractor, encode_png

    def make(t: pa.Table) -> pa.Table:
        lens = (pc.binary_length(pc.cast(t["text"], pa.binary()))
                .to_numpy(zero_copy_only=False).astype(np.int64))
        imgs = []
        for L in lens:
            c, w, h = int(L % 256), int(L % 29 + 4), int(L % 17 + 4)
            row = ((c + np.arange(w)) % 256).astype(np.uint8)
            img = np.repeat(np.tile(row, (h, 1))[..., None], 3, axis=2)
            imgs.append(encode_png(img, color_type=(0, 2, 3)[L % 3],
                                   filter_type="cycle"))
        return pa.table({"doc_id": t["doc_id"],
                         "image": pa.array(imgs, type=pa.binary())})

    out = (_docs(sf_dir)
           .map_batches(make, batch_format="pyarrow")
           .map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                        batch_size=64, concurrency=2,
                        fn_constructor_kwargs=dict(col="image", dim=16,
                                                   decoder="real"),
                        max_restarts=0))

    def shape(t: pa.Table) -> pa.Table:
        f0 = pc.list_element(t["image_feat"], 0)
        f3 = pc.list_element(t["image_feat"], 3)
        return pa.table({
            "doc_id": t["doc_id"],
            "image_width": t["image_width"],
            "image_height": t["image_height"],
            "gray_milli0": pc.cast(pc.round(pc.multiply(f0, 1000.0)),
                                   pa.int64()),
            "gray_milli3": pc.cast(pc.round(pc.multiply(f3, 1000.0)),
                                   pa.int64()),
        })

    return out.map_batches(shape, batch_format="pyarrow")


def _q_media_features_jpeg(sf_dir: str):
    """Built-in baseline-JPEG decode path: one solid-gray JPEG per doc
    (c = byte-length % 256) with the uniform-8 quant table — the one
    configuration where JPEG round-trips BIT-EXACTLY (DC = (c-128)*8
    divides the quantizer; AC all zero) — alternating grayscale and
    YCbCr 4:4:4 encodings by doc. The actor-pool stage runs the full
    huffman → dequant → IDCT → color-convert pipeline; dims and the grid
    feature are recomputed by the SQL oracle, value-hash exact."""
    import pyarrow.compute as pc

    from rayssj.multimodal import ImageFeatureExtractor, encode_jpeg

    def make(t: pa.Table) -> pa.Table:
        lens = (pc.binary_length(pc.cast(t["text"], pa.binary()))
                .to_numpy(zero_copy_only=False).astype(np.int64))
        q8 = np.full(64, 8)
        imgs = []
        for L in lens:
            c, w, h = int(L % 256), int(L % 31 + 4), int(L % 19 + 4)
            img = np.full((h, w, 3), c, dtype=np.uint8)
            imgs.append(encode_jpeg(img, quant_table=q8,
                                    grayscale=bool(L % 2)))
        return pa.table({"doc_id": t["doc_id"],
                         "image": pa.array(imgs, type=pa.binary())})

    out = (_docs(sf_dir)
           .map_batches(make, batch_format="pyarrow")
           .map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                        batch_size=64, concurrency=2,
                        fn_constructor_kwargs=dict(col="image", dim=16,
                                                   decoder="real"),
                        max_restarts=0))
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "image_width": t["image_width"],
            "image_height": t["image_height"],
            "gray_milli": pc.cast(
                pc.round(pc.multiply(pc.list_element(t["image_feat"], 0),
                                     1000.0)), pa.int64()),
        }), batch_format="pyarrow")


def _q_sample_pairs(sf_dir: str):
    from rayssj.sampler import sample_pairs
    from rayssj.tokenizers import WhitespaceTokenizer

    return sample_pairs(_docs(sf_dir), _docs(sf_dir), "doc_id", "doc_id",
                        "text", "text", WhitespaceTokenizer(),
                        sample_size=50, y_param=6, seed=7)


def _q_sample_pairs_topk(sf_dir: str):
    """Deterministic top-overlap half of sample_pairs (fill=False), with
    sample_size >= |R| so the hash-Bernoulli R-sample is the identity: per r,
    the y/2 = 3 highest-overlap l docs (distinct shared whitespace tokens,
    ties by l key) — exactly SQL-expressible, giving the driver a value-hash
    oracle on this operator (the full fill variant keeps its py-oracle)."""
    from rayssj.sampler import sample_pairs
    from rayssj.tokenizers import WhitespaceTokenizer

    return sample_pairs(_docs(sf_dir), _docs(sf_dir), "doc_id", "doc_id",
                        "text", "text", WhitespaceTokenizer(),
                        sample_size=1_000_000_000, y_param=6, seed=7,
                        fill=False)


def _q_cluster(sf_dir: str):
    from rayssj.cluster import connected_components
    from rayssj.joins import jaccard_join
    from rayssj.tokenizers import WhitespaceTokenizer

    pairs = jaccard_join(_docs(sf_dir), None, "doc_id", "doc_id", "text",
                         "text", WhitespaceTokenizer(), 0.9, self_join=True)
    return connected_components(pairs, "l_doc_id", "r_doc_id")


def entry() -> Any:
    """Flagship pipeline on sf0.001: documents → synthetic CC-style pages
    (url, warc_ts, html, text, lang) → extract text (20% of rows must derive
    it from html) → jaccard self-join blocking+verify → transitive clusters."""
    import pyarrow.compute as pc
    import ray.data as rd

    from rayssj.cluster import connected_components
    from rayssj.extract import extract_stage
    from rayssj.joins import jaccard_join
    from rayssj.tokenizers import WhitespaceTokenizer

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        urls = [f"https://example.com/doc/{i}" for i in ids]
        html = [("<html><head><title>doc</title></head><body><p>"
                 + (t or "") + "</p></body></html>").encode() for t in texts]
        # hold out 20%: those rows' text must be re-derived from html
        text = [None if i % 5 == 0 else ("doc\n" + (t or "")) for i, t in zip(ids, texts)]
        ts = pa.array(np.asarray(ids, dtype="datetime64[us]"))
        return pa.table({"url": pa.array(urls), "warc_ts": ts,
                         "html": pa.array(html, type=pa.binary()),
                         "text": pa.array(text, type=pa.string()),
                         "lang": batch["lang"]})

    pages = docs.map_batches(to_pages, batch_format="pyarrow")
    extracted = extract_stage(pages)  # drops html, fills text byte-identically
    pairs = jaccard_join(extracted, None, "url", "url", "text", "text",
                         WhitespaceTokenizer(), 0.8, self_join=True)
    return connected_components(pairs, "l_url", "r_url")


def queries() -> dict[str, Callable[[str], Any]]:
    from rayssj.joins import (
        cosine_join,
        dice_join,
        jaccard_join,
        overlap_coefficient_join,
        overlap_join,
    )
    from rayssj.tokenizers import QgramTokenizer

    return {
        "jaccard_ws": _set_join(jaccard_join, 0.5),
        "cosine_ws": _set_join(cosine_join, 0.7),
        "dice_ws": _set_join(dice_join, 0.6),
        "overlap_ws": _set_join(overlap_join, 25),
        "overlap_coeff_ws": _set_join(overlap_coefficient_join, 0.9),
        "jaccard_q3": _set_join(jaccard_join, 0.6, QgramTokenizer(3, return_set=True)),
        "edit_distance_q2": _q_edit_distance,
        "overlap_filter": _q_overlap_filter,
        "prefix_filter": _q_prefix_filter,
        "size_filter": _q_size_filter,
        "position_filter": _q_position_filter,
        "suffix_filter": _q_suffix_filter,
        "apply_matcher": _q_apply_matcher,
        "profile_documents": _q_profile,
        "exact_dedup": _q_exact_dedup,
        "token_counts": _q_token_counts,
        "quality_stats": _q_quality,
        "langid": _q_langid,
        "fingerprint": _q_fingerprint,
        "minhash_pairs": _q_minhash_pairs,
        "minhash_exact": _q_minhash_exact,
        "simhash_pairs": _q_simhash_pairs,
        "embedding_pairs": _q_embedding_pairs,
        "ann_topk": _q_ann_topk,
        "ann_ivf": _q_ann_ivf,
        "cluster_components": _q_cluster,
        "media_features": _q_media_features,
        "media_features_real": _q_media_features_real,
        "media_features_png": _q_media_features_png,
        "media_features_jpeg": _q_media_features_jpeg,
        "sample_pairs": _q_sample_pairs,
        "sample_pairs_topk": _q_sample_pairs_topk,
    }


_DT = """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
dt AS (SELECT DISTINCT doc_id, tok FROM toks WHERE tok <> ''),
sizes AS (SELECT doc_id, count(*) n FROM dt GROUP BY doc_id),
ov AS (SELECT a.doc_id la, b.doc_id rb, count(*) o
       FROM dt a JOIN dt b USING (tok) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (SELECT la, rb, o, sa.n n1, sb.n n2
          FROM ov JOIN sizes sa ON sa.doc_id = la JOIN sizes sb ON sb.doc_id = rb)
"""


def _set_sim_sql(expr: str, cond: str) -> str:
    return (_DT + f"SELECT la AS l_doc_id, rb AS r_doc_id, {expr} AS _sim_score "
                  f"FROM pairs WHERE {cond}")


_QG = """WITH idx AS (
  SELECT unnest(range(1, (SELECT max(length(text)) + 3 FROM documents))) AS i),
g AS (
  SELECT doc_id, substr('##' || text || '$$', i::INT, 3) AS tok
  FROM documents, idx WHERE i <= length(text) + 2),
dt AS (SELECT DISTINCT doc_id, tok FROM g),
sizes AS (SELECT doc_id, count(*) n FROM dt GROUP BY doc_id),
ov AS (SELECT a.doc_id la, b.doc_id rb, count(*) o
       FROM dt a JOIN dt b USING (tok) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (SELECT la, rb, o, sa.n n1, sb.n n2
          FROM ov JOIN sizes sa ON sa.doc_id = la JOIN sizes sb ON sb.doc_id = rb)
"""


def _langid_sql() -> str:
    """DuckDB replica of rayssj.textstats.LangIdScorer: same RE2 patterns
    (regexp_extract_all ≡ pc.count_substring_regex), same first-max
    tie-break over alphabetically-ordered languages."""
    from rayssj.textstats import _CJK_PATTERN, _LANG_STOPWORDS, _WORD_PATTERN

    langs = sorted(_LANG_STOPWORDS)
    hit_cols = ",\n         ".join(
        "len(regexp_extract_all(lower(text), '\\b(?:"
        + "|".join(sorted(_LANG_STOPWORDS[lg])) + ")\\b')) AS h_" + lg
        for lg in langs)
    ratio_cols = ", ".join(
        f"h_{lg} * 1.0 / greatest(words, 1) AS r_{lg}" for lg in langs)
    best = "greatest(" + ", ".join(f"r_{lg}" for lg in langs) + ")"
    # first max wins, langs in alphabetical order (numpy argmax semantics)
    pred_cases = []
    for i, lg in enumerate(langs):
        conds = [f"r_{lg} >= r_{other}" for other in langs[i + 1:]]
        pred_cases.append(("WHEN " + " AND ".join(conds) + f" THEN '{lg}'")
                          if conds else f"ELSE '{lg}'")
    pred = "\n            ".join(pred_cases)
    return f"""WITH t AS (
  SELECT doc_id, length(text) AS L,
         len(regexp_extract_all(text, '{_CJK_PATTERN}')) AS cjk,
         len(regexp_extract_all(lower(text), '{_WORD_PATTERN}')) AS words,
         {hit_cols}
  FROM documents),
r AS (SELECT doc_id, L, cjk, words, {ratio_cols} FROM t)
SELECT doc_id,
  CASE WHEN cjk * 2 > L * 0.1 THEN 'zh'
       WHEN words = 0 OR {best} <= 0 THEN 'und'
       ELSE CASE {pred} END END AS lang_pred,
  CASE WHEN cjk * 2 > L * 0.1 THEN 1.0
       WHEN words = 0 OR {best} <= 0 THEN 0.0
       ELSE {best} END AS lang_score
FROM r"""


def oracle_sql() -> dict[str, str]:
    return {
        "langid": _langid_sql(),
        "jaccard_ws": _set_sim_sql("o * 1.0 / (n1 + n2 - o)",
                                   "o * 1.0 / (n1 + n2 - o) >= 0.5"),
        "cosine_ws": _set_sim_sql("o / sqrt(n1 * 1.0 * n2)",
                                  "o / sqrt(n1 * 1.0 * n2) >= 0.7"),
        "dice_ws": _set_sim_sql("2.0 * o / (n1 + n2)",
                                "2.0 * o / (n1 + n2) >= 0.6"),
        "overlap_ws": _set_sim_sql("o * 1.0", "o >= 25"),
        "overlap_coeff_ws": _set_sim_sql("o * 1.0 / least(n1, n2)",
                                         "o * 1.0 / least(n1, n2) >= 0.9"),
        "jaccard_q3": _QG + ("SELECT la AS l_doc_id, rb AS r_doc_id, "
                             "o * 1.0 / (n1 + n2 - o) AS _sim_score FROM pairs "
                             "WHERE o * 1.0 / (n1 + n2 - o) >= 0.6"),
        "edit_distance_q2": (
            "SELECT a.doc_id AS l_doc_id, b.doc_id AS r_doc_id, "
            "CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS DOUBLE) AS _sim_score "
            "FROM documents a JOIN documents b ON a.doc_id < b.doc_id "
            "WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 3"),
        "overlap_filter": _DT + ("SELECT la AS l_doc_id, rb AS r_doc_id "
                                 "FROM pairs WHERE o >= 25"),
        "prefix_filter": """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
dt AS (SELECT DISTINCT doc_id, tok FROM toks WHERE tok <> ''),
df AS (SELECT tok, count(*) c FROM dt GROUP BY tok),
rk AS (SELECT tok, row_number() OVER (ORDER BY c, tok) rnk FROM df),
pos AS (SELECT d.doc_id, d.tok,
               row_number() OVER (PARTITION BY d.doc_id ORDER BY r.rnk) p,
               count(*) OVER (PARTITION BY d.doc_id) n
        FROM dt d JOIN rk r USING (tok)),
pref AS (SELECT doc_id, tok FROM pos WHERE p <= n - ceil(0.9 * n - 1e-9) + 1)
SELECT DISTINCT a.doc_id AS l_doc_id, b.doc_id AS r_doc_id
FROM pref a JOIN pref b USING (tok) WHERE a.doc_id < b.doc_id""",
        "position_filter": """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
dt AS (SELECT DISTINCT doc_id, tok FROM toks WHERE tok <> ''),
df AS (SELECT tok, count(*) c FROM dt GROUP BY tok),
rk AS (SELECT tok, row_number() OVER (ORDER BY c, tok) rnk FROM df),
pos AS (SELECT d.doc_id, d.tok, r.rnk,
               row_number() OVER (PARTITION BY d.doc_id ORDER BY r.rnk) p,
               count(*) OVER (PARTITION BY d.doc_id) n
        FROM dt d JOIN rk r USING (tok)),
pref AS (SELECT doc_id, tok, rnk, p, n FROM pos
         WHERE p <= n - ceil(0.9 * n - 1e-9) + 1),
agg AS (SELECT a.doc_id la, b.doc_id rb, count(*) c,
               arg_max(a.p, a.rnk) pa_last, arg_max(b.p, a.rnk) pb_last,
               any_value(a.n) na, any_value(b.n) nb
        FROM pref a JOIN pref b USING (tok)
        WHERE a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id)
SELECT la AS l_doc_id, rb AS r_doc_id FROM agg
WHERE c + least(na - pa_last, nb - pb_last) >= ceil(0.9 / 1.9 * (na + nb) - 1e-9)""",
        "size_filter": """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
dt AS (SELECT DISTINCT doc_id, tok FROM toks WHERE tok <> ''),
sizes AS (SELECT doc_id, count(*) n FROM dt GROUP BY doc_id)
SELECT a.doc_id AS l_doc_id, b.doc_id AS r_doc_id
FROM sizes a JOIN sizes b ON a.doc_id < b.doc_id
WHERE (b.n BETWEEN ceil(0.9 * a.n - 1e-9) AND floor(a.n / 0.9 + 1e-9))
   OR (a.n BETWEEN ceil(0.9 * b.n - 1e-9) AND floor(b.n / 0.9 + 1e-9))""",
        "apply_matcher": _set_sim_sql("o * 1.0 / (n1 + n2 - o)",
                                      "o >= 25 AND o * 1.0 / (n1 + n2 - o) >= 0.8"),
        "profile_documents": """SELECT 'doc_id' AS attr, count(DISTINCT doc_id) AS n_unique,
       count(*) FILTER (WHERE doc_id IS NULL) AS n_missing FROM documents
UNION ALL SELECT 'text', count(DISTINCT text),
       count(*) FILTER (WHERE text IS NULL) FROM documents
UNION ALL SELECT 'lang', count(DISTINCT lang),
       count(*) FILTER (WHERE lang IS NULL) FROM documents""",
        "exact_dedup": """SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text""",
        "embedding_pairs": """SELECT a.vec_id AS l_vec_id, b.vec_id AS r_vec_id
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4""",
        "token_counts": """SELECT doc_id,
       len(regexp_extract_all(text, '\\S+')) AS ws_tokens,
       len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS bpe_tokens
FROM documents""",
        "media_features": """SELECT doc_id,
       CAST(strlen(text) % 1000 + 1 AS INT) AS image_width,
       CAST(strlen(text) % 700 + 1 AS INT) AS image_height,
       64 AS n_feat, 1024 AS small_len
FROM documents""",
        "media_features_real": """SELECT doc_id,
       CAST(strlen(text) % 37 + 4 AS INT) AS image_width,
       CAST(strlen(text) % 23 + 4 AS INT) AS image_height,
       CAST(round(((strlen(text) % 256) / 255.0 * 2 - 1) * 1000) AS BIGINT)
           AS gray_milli
FROM documents""",
        "media_features_jpeg": """SELECT doc_id,
       CAST(strlen(text) % 31 + 4 AS INT) AS image_width,
       CAST(strlen(text) % 19 + 4 AS INT) AS image_height,
       CAST(round(((strlen(text) % 256) / 255.0 * 2 - 1) * 1000) AS BIGINT)
           AS gray_milli
FROM documents""",
        "media_features_png": """SELECT doc_id,
       CAST(strlen(text) % 29 + 4 AS INT) AS image_width,
       CAST(strlen(text) % 17 + 4 AS INT) AS image_height,
       CAST(round(((strlen(text) % 256) / 255.0 * 2 - 1) * 1000) AS BIGINT)
           AS gray_milli0,
       CAST(round((((strlen(text) % 256 + strlen(text) % 29 + 3) % 256)
                   / 255.0 * 2 - 1) * 1000) AS BIGINT) AS gray_milli3
FROM documents""",
        "minhash_exact": """WITH idx AS (
  SELECT unnest(range(1, (SELECT max(length(text)) FROM documents))) AS i),
sh AS (SELECT DISTINCT doc_id, substr(text, i::INT, 5) AS s
       FROM documents, idx WHERE i <= length(text) - 4),
sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
ov AS (SELECT a.doc_id la, b.doc_id rb, count(*) o
       FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT la AS l_doc_id, rb AS r_doc_id,
       o * 1.0 / (sa.n + sb.n - o) AS _sim_score
FROM ov JOIN sizes sa ON sa.doc_id = la JOIN sizes sb ON sb.doc_id = rb
WHERE o * 1.0 / (sa.n + sb.n - o) >= 0.8""",
        "cluster_components": """WITH RECURSIVE
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
dt AS (SELECT DISTINCT doc_id, tok FROM toks WHERE tok <> ''),
sizes AS (SELECT doc_id, count(*) n FROM dt GROUP BY doc_id),
ov AS (SELECT a.doc_id la, b.doc_id rb, count(*) o
       FROM dt a JOIN dt b USING (tok) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
match_pairs AS (SELECT la, rb
       FROM ov JOIN sizes sa ON sa.doc_id = la JOIN sizes sb ON sb.doc_id = rb
       WHERE o * 1.0 / (sa.n + sb.n - o) >= 0.9),
edges AS (SELECT la a, rb b FROM match_pairs UNION SELECT rb, la FROM match_pairs),
cc(node, comp) AS (
    SELECT a, a FROM edges
  UNION
    SELECT e.b, cc.comp FROM cc JOIN edges e ON e.a = cc.node
)
SELECT node, min(comp) AS component FROM cc GROUP BY node""",
        "ann_ivf": """WITH q AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS query_id, embedding AS qe
  FROM embeddings ORDER BY vec_id LIMIT 5),
scored AS (SELECT q.query_id, e.vec_id AS key,
                  list_cosine_similarity(q.qe, e.embedding) AS s
           FROM q CROSS JOIN embeddings e),
ranked AS (SELECT query_id, key,
                  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, key) rn
           FROM scored)
SELECT query_id, key FROM ranked WHERE rn <= 10""",
        "ann_topk": """WITH q AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS query_id, embedding AS qe
  FROM embeddings ORDER BY vec_id LIMIT 5),
scored AS (SELECT q.query_id, e.vec_id AS key,
                  list_cosine_similarity(q.qe, e.embedding) AS s
           FROM q CROSS JOIN embeddings e),
ranked AS (SELECT query_id, key,
                  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, key) rn
           FROM scored)
SELECT query_id, key FROM ranked WHERE rn <= 10""",
        "sample_pairs_topk": """WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
dt AS (SELECT DISTINCT doc_id, tok FROM toks WHERE tok <> ''),
ov AS (SELECT a.doc_id la, b.doc_id rb, count(*) o
       FROM dt a JOIN dt b USING (tok) GROUP BY 1, 2),
rk AS (SELECT la, rb,
              row_number() OVER (PARTITION BY rb ORDER BY o DESC, la) rn
       FROM ov)
SELECT la AS l_doc_id, rb AS r_doc_id FROM rk WHERE rn <= 3""",
        "quality_stats": """SELECT doc_id, length(text) AS n_chars,
       len(regexp_extract_all(text, '\\S+')) AS n_tokens,
       CASE WHEN len(regexp_extract_all(text, '\\S+')) > 0
            THEN (length(text) - greatest(len(regexp_extract_all(text, '\\S+')) - 1, 0))
                 * 1.0 / greatest(len(regexp_extract_all(text, '\\S+')), 1)
            ELSE 0.0 END AS mean_token_len
FROM documents""",
    }
