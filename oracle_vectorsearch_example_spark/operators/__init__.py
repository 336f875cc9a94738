from oracle_vectorsearch_example_spark.operators.search import (
    cosine_neardup_pairs,
    cosine_neardup_pairs_sparse,
    topk_search,
)
from oracle_vectorsearch_example_spark.operators.ivf import IvfIndex, recall_at_k
from oracle_vectorsearch_example_spark.operators.lsh_ann import CosineLshIndex
from oracle_vectorsearch_example_spark.operators.dedup import (
    dedup_by_components,
    exact_dedup,
    jaccard_neardup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    neardup_components,
    simhash,
)
from oracle_vectorsearch_example_spark.operators.packing import pack_sequences
from oracle_vectorsearch_example_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
    stratified_sample,
)
from oracle_vectorsearch_example_spark.operators.joins import asof_join, range_join
from oracle_vectorsearch_example_spark.operators.resample import time_bucket_gapfill
from oracle_vectorsearch_example_spark.operators.sessionize import sessionize
from oracle_vectorsearch_example_spark.operators.skew import salted_agg, salted_join
from oracle_vectorsearch_example_spark.operators.multimodal import (
    audio_features,
    binary_stats,
    extract_media_features,
    image_features,
    resize_media,
    sample_frames,
)

__all__ = [
    "topk_search",
    "cosine_neardup_pairs",
    "cosine_neardup_pairs_sparse",
    "IvfIndex",
    "CosineLshIndex",
    "recall_at_k",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "jaccard_neardup_pairs",
    "simhash",
    "neardup_components",
    "dedup_by_components",
    "hash_bucket",
    "hash_split",
    "hash_sample",
    "stratified_sample",
    "pack_sequences",
    "asof_join",
    "range_join",
    "sessionize",
    "time_bucket_gapfill",
    "salted_agg",
    "salted_join",
    "binary_stats",
    "extract_media_features",
    "image_features",
    "audio_features",
    "resize_media",
    "sample_frames",
]
