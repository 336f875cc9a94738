from oracle_vectorsearch_example_spark.operators.search import (
    cosine_neardup_pairs,
    cosine_neardup_pairs_sparse,
    mine_hard_negatives,
    mrl_topk_search,
    topk_search,
)
from oracle_vectorsearch_example_spark.operators.ivf import IvfIndex, recall_at_k
from oracle_vectorsearch_example_spark.operators.lsh_ann import CosineLshIndex
from oracle_vectorsearch_example_spark.operators.hnsw import ShardedHnswIndex
from oracle_vectorsearch_example_spark.operators.bm25 import (
    Bm25Index,
    IncrementalBm25,
    bm25_index,
    bm25_search,
    bm25_search_prf,
    bm25_search_terms,
    prf_terms,
    rrf_fuse,
)
from oracle_vectorsearch_example_spark.operators.sparse import (
    sparse_topk_search,
    tfidf_fit,
    tfidf_transform,
    tfidf_vectors,
    to_dense,
    to_sparse,
)
from oracle_vectorsearch_example_spark.operators.maxsim import (
    doc_centroids,
    maxsim_topk,
    pack_token_ids,
    token_candidates,
)
from oracle_vectorsearch_example_spark.operators.mmr import mmr_select, mmr_topk_search
from oracle_vectorsearch_example_spark.operators.bq import (
    bq_encode_df,
    bq_topk_search,
)
from oracle_vectorsearch_example_spark.operators.quantize import (
    pq_ivf_search,
    pq_refine_topk,
    pq_topk_search,
    sq8_encode_df,
    sq8_ivf_search,
    sq8_topk_search,
)
from oracle_vectorsearch_example_spark.operators.dedup import (
    contamination_report,
    decontaminate,
    dedup_by_components,
    exact_dedup,
    jaccard_neardup_pairs,
    lsh_plan,
    minhash_lsh_pairs,
    minhash_signatures,
    neardup_components,
    simhash,
    source_overlap,
)
from oracle_vectorsearch_example_spark.operators.substring import (
    exact_substring_dedup,
)
from oracle_vectorsearch_example_spark.operators.bloom import (
    BloomFilter,
    bloom_anti_join,
    bloom_build,
    bloom_semi_join,
    bloom_tag,
    bloom_words_df,
    bloom_words_row,
)
from oracle_vectorsearch_example_spark.operators.outliers import (
    assign_centers,
    embedding_outliers,
    prototype_prune,
)
from oracle_vectorsearch_example_spark.operators.eval import (
    eval_rankings,
    eval_summary,
)
from oracle_vectorsearch_example_spark.operators.drift import (
    psi_drifted_dims,
    psi_report,
)
from oracle_vectorsearch_example_spark.operators.pca import (
    PcaModel,
    pca_fit,
    pca_topk_search,
)
from oracle_vectorsearch_example_spark.operators.sketch import (
    cms_estimate,
    cms_table,
    heavy_hitters,
)
from oracle_vectorsearch_example_spark.operators.semdedup import semdedup
from oracle_vectorsearch_example_spark.operators.incremental import (
    IncrementalDedup,
    IncrementalImageDedup,
    IncrementalMediaDedup,
    dedup_incremental,
    image_dedup_incremental,
    media_dedup_incremental,
)
from oracle_vectorsearch_example_spark.operators.dsir import (
    dsir_fit,
    dsir_sample,
    dsir_scores,
)
from oracle_vectorsearch_example_spark.operators.video import (
    dedup_videos,
    video_frame_hashes,
    video_neardup_pairs,
)
from oracle_vectorsearch_example_spark.operators.urls import (
    canonical_url,
    surt_key,
    domain_stats,
    url_dedup,
    url_domain,
)
from oracle_vectorsearch_example_spark.operators.nb import (
    NbQualityModel,
    nb_filter,
    nb_fit,
    nb_pareto_filter,
    nb_pareto_scores,
    nb_scores,
)
from oracle_vectorsearch_example_spark.operators.langid import (
    LangidModel,
    langid_df,
    langid_fit,
    langid_predict,
    langid_scores,
)
from oracle_vectorsearch_example_spark.operators.fuzzy import (
    fuzzy_join,
    fuzzy_self_pairs,
)
from oracle_vectorsearch_example_spark.operators.packing import (
    pack_sequences,
    pack_sequences_bfd,
)
from oracle_vectorsearch_example_spark.operators.sampling import (
    deterministic_shuffle,
    group_sample,
    hash_bucket,
    hash_sample,
    hash_split,
    mix_sources,
    temperature_multipliers,
    repeat_epochs,
    stratified_sample,
)
from oracle_vectorsearch_example_spark.operators.layout import zorder_write
from oracle_vectorsearch_example_spark.operators.joins import asof_join, range_join
from oracle_vectorsearch_example_spark.operators.resample import time_bucket_gapfill
from oracle_vectorsearch_example_spark.operators.sessionize import sessionize
from oracle_vectorsearch_example_spark.operators.topics import (
    ctfidf_terms,
    topic_stats,
)
from oracle_vectorsearch_example_spark.operators.skew import (
    salted_agg,
    salted_agg_auto,
    salted_join,
)
from oracle_vectorsearch_example_spark.operators.profile import profile_table
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
    "mrl_topk_search",
    "mine_hard_negatives",
    "cosine_neardup_pairs",
    "cosine_neardup_pairs_sparse",
    "IvfIndex",
    "CosineLshIndex",
    "ShardedHnswIndex",
    "recall_at_k",
    "Bm25Index",
    "IncrementalBm25",
    "bm25_index",
    "bm25_search",
    "bm25_search_terms",
    "bm25_search_prf",
    "prf_terms",
    "rrf_fuse",
    "sparse_topk_search",
    "to_sparse",
    "to_dense",
    "tfidf_fit",
    "tfidf_transform",
    "tfidf_vectors",
    "doc_centroids",
    "maxsim_topk",
    "pack_token_ids",
    "token_candidates",
    "mmr_select",
    "mmr_topk_search",
    "bq_encode_df",
    "bq_topk_search",
    "sq8_encode_df",
    "sq8_topk_search",
    "sq8_ivf_search",
    "pq_topk_search",
    "pq_refine_topk",
    "pq_ivf_search",
    "exact_dedup",
    "minhash_signatures",
    "lsh_plan",
    "minhash_lsh_pairs",
    "jaccard_neardup_pairs",
    "simhash",
    "neardup_components",
    "dedup_by_components",
    "contamination_report",
    "decontaminate",
    "source_overlap",
    "exact_substring_dedup",
    "BloomFilter",
    "bloom_anti_join",
    "bloom_build",
    "bloom_semi_join",
    "bloom_tag",
    "bloom_words_df",
    "bloom_words_row",
    "cms_estimate",
    "cms_table",
    "heavy_hitters",
    "assign_centers",
    "embedding_outliers",
    "prototype_prune",
    "eval_rankings",
    "eval_summary",
    "psi_report",
    "psi_drifted_dims",
    "PcaModel",
    "pca_fit",
    "pca_topk_search",
    "semdedup",
    "IncrementalDedup",
    "IncrementalImageDedup",
    "IncrementalMediaDedup",
    "dedup_incremental",
    "image_dedup_incremental",
    "media_dedup_incremental",
    "dsir_fit",
    "dsir_scores",
    "dsir_sample",
    "canonical_url",
    "surt_key",
    "url_domain",
    "url_dedup",
    "domain_stats",
    "NbQualityModel",
    "nb_fit",
    "nb_scores",
    "nb_filter",
    "nb_pareto_scores",
    "nb_pareto_filter",
    "LangidModel",
    "langid_fit",
    "langid_scores",
    "langid_predict",
    "langid_df",
    "fuzzy_self_pairs",
    "fuzzy_join",
    "hash_bucket",
    "hash_split",
    "hash_sample",
    "group_sample",
    "stratified_sample",
    "repeat_epochs",
    "mix_sources",
    "temperature_multipliers",
    "dedup_videos",
    "video_frame_hashes",
    "video_neardup_pairs",
    "deterministic_shuffle",
    "pack_sequences",
    "pack_sequences_bfd",
    "zorder_write",
    "asof_join",
    "range_join",
    "sessionize",
    "ctfidf_terms",
    "topic_stats",
    "time_bucket_gapfill",
    "salted_agg",
    "salted_agg_auto",
    "salted_join",
    "profile_table",
    "binary_stats",
    "extract_media_features",
    "image_features",
    "audio_features",
    "resize_media",
    "sample_frames",
]
