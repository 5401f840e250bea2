"""rayssj — Ray-Data-native string-similarity record-linkage engine.

From-scratch re-expression of the query/data-processing capabilities of the
py_stringsimjoin reference (Sripradha-karkala/py_stringsimjoin-2; semantics per
SURVEY.md §2) as streaming ray.data.Dataset pipelines: zero-copy Arrow
map_batches tokenization, groupby-shuffle prefix-token blocking, stateful
actor-pool verification kernels, and distributed transitive-closure clustering.
"""

from rayssj.tokenizers import (
    QgramTokenizer,
    WhitespaceTokenizer,
    DelimiterTokenizer,
    AlphabeticTokenizer,
    AlphanumericTokenizer,
)
from rayssj.joins import (
    jaccard_join,
    cosine_join,
    dice_join,
    overlap_coefficient_join,
    overlap_join,
    edit_distance_join,
)
from rayssj.filters import (
    OverlapFilter,
    SizeFilter,
    PrefixFilter,
    PositionFilter,
    SuffixFilter,
)
from rayssj.matcher import apply_matcher
from rayssj.profiler import profile_table_for_join
from rayssj.sampler import sample_pairs
from rayssj.converter import dataframe_column_to_str, series_to_str
from rayssj.cluster import connected_components
from rayssj.extract import extract_stage, extract_text
from rayssj.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs, embedding_cosine_pairs
from rayssj.ann import knn_cosine, knn_cosine_ivf, knn_cosine_lsh
from rayssj.multimodal import (
    AudioFeatureExtractor,
    FrameSampler,
    ImageFeatureExtractor,
    ImageResizer,
    encode_jpeg,
    encode_png,
    media_pipeline,
)

__all__ = [
    "QgramTokenizer",
    "WhitespaceTokenizer",
    "DelimiterTokenizer",
    "AlphabeticTokenizer",
    "AlphanumericTokenizer",
    "jaccard_join",
    "cosine_join",
    "dice_join",
    "overlap_coefficient_join",
    "overlap_join",
    "edit_distance_join",
    "OverlapFilter",
    "SizeFilter",
    "PrefixFilter",
    "PositionFilter",
    "SuffixFilter",
    "apply_matcher",
    "profile_table_for_join",
    "sample_pairs",
    "dataframe_column_to_str",
    "series_to_str",
    "connected_components",
    "extract_stage",
    "extract_text",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_cosine_pairs",
    "knn_cosine",
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "AudioFeatureExtractor",
    "FrameSampler",
    "ImageFeatureExtractor",
    "ImageResizer",
    "encode_jpeg",
    "encode_png",
    "media_pipeline",
]
