from oracle_vectorsearch_example_spark.functions.distances import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    l1_distance,
    l2_distance,
    vector_distance,
)
from oracle_vectorsearch_example_spark.functions.chunker import (
    chunk_by_chars,
    chunk_by_custom_udf,
    chunk_by_sentences_udf,
    chunk_by_words,
    semantic_chunks,
)
from oracle_vectorsearch_example_spark.functions.embedding import (
    HashingEmbedder,
    OnnxEmbedder,
    WordPieceTokenizer,
    hashing_embedding,
)
from oracle_vectorsearch_example_spark.functions.rerank import (
    CrossEncoderReranker,
)
from oracle_vectorsearch_example_spark.functions.lm import (
    BigramLM,
    perplexity_buckets,
    perplexity_df,
    perplexity_filter,
    train_bigram_lm,
)
from oracle_vectorsearch_example_spark.functions.summary import (
    summarize_df,
    utl_to_summary,
)
from oracle_vectorsearch_example_spark.functions.snippet import snippet_df
from oracle_vectorsearch_example_spark.functions.afp import (
    afp_df,
    afp_expr,
    afp_from_samples,
    dedup_audio,
)
from oracle_vectorsearch_example_spark.functions.avi import (
    riff_info_tags,
    riff_tag_text,
)
from oracle_vectorsearch_example_spark.functions.ebml import (
    make_simple_mkv,
    mkv_meta,
    mkv_tag_text,
    mkv_tags,
)
from oracle_vectorsearch_example_spark.functions.mov import (
    mov_tag_text,
    mov_tags,
)
from oracle_vectorsearch_example_spark.functions.ogg import (
    flac_tag_text,
    flac_tags,
    make_simple_ogg,
    ogg_meta,
    ogg_page_table,
    ogg_tag_text,
    ogg_tags,
    parse_vorbis_comments,
)
from oracle_vectorsearch_example_spark.functions.mp4 import (
    decode_mp4_frames,
    make_simple_mp4,
    mp4_audio_pcm,
    mp4_brand,
    mp4_frame_table,
)
from oracle_vectorsearch_example_spark.functions.mp3 import (
    dedup_mp3,
    make_simple_mp3,
    mp3_frame_table,
    mp3_gain_code,
    mp3_gain_code_df,
    mp3_gain_envelope,
    mp3_side_info,
    mp3_tag_text,
    mp3_tags,
)
from oracle_vectorsearch_example_spark.functions.phash import (
    dedup_images,
    phash_band_candidates,
    phash_df,
    phash_from_pixels,
    phash_gray_expr,
    phash_neardup_pairs,
)
from oracle_vectorsearch_example_spark.functions.scrub import (
    c4_clean_df,
    redact_pii_df,
    remove_boilerplate_lines,
)
from oracle_vectorsearch_example_spark.functions.extract import (
    detect_format,
    extract_text,
    extract_text_bytes,
    make_simple_html,
    make_simple_pdf,
    with_extracted_text,
)
from oracle_vectorsearch_example_spark.functions.sql import register_sql_functions
from oracle_vectorsearch_example_spark.functions.textstats import (
    bpe_ish_token_count,
    fingerprint,
    gopher_repetition_arrow_df,
    gopher_repetition_df,
    gopher_rules_df,
    lang_id,
    quality_score,
    winnow_fingerprints_df,
    ws_token_count,
)
from oracle_vectorsearch_example_spark.functions.vectors import (
    normalize_l2,
    parse_vector,
)

__all__ = [
    "afp_df",
    "afp_expr",
    "afp_from_samples",
    "dedup_audio",
    "cosine_distance",
    "cosine_similarity",
    "dot_product",
    "l1_distance",
    "l2_distance",
    "vector_distance",
    "chunk_by_chars",
    "chunk_by_custom_udf",
    "chunk_by_sentences_udf",
    "chunk_by_words",
    "semantic_chunks",
    "HashingEmbedder",
    "OnnxEmbedder",
    "WordPieceTokenizer",
    "hashing_embedding",
    "CrossEncoderReranker",
    "BigramLM",
    "train_bigram_lm",
    "perplexity_df",
    "perplexity_filter",
    "perplexity_buckets",
    "utl_to_summary",
    "summarize_df",
    "snippet_df",
    "decode_mp4_frames",
    "make_simple_mp4",
    "mp4_audio_pcm",
    "mp4_brand",
    "mp4_frame_table",
    "dedup_mp3",
    "make_simple_mp3",
    "mp3_frame_table",
    "mp3_gain_code",
    "mp3_gain_code_df",
    "mp3_gain_envelope",
    "mp3_side_info",
    "mp3_tag_text",
    "mp3_tags",
    "flac_tag_text",
    "flac_tags",
    "make_simple_ogg",
    "ogg_meta",
    "ogg_page_table",
    "ogg_tag_text",
    "ogg_tags",
    "parse_vorbis_comments",
    "riff_info_tags",
    "riff_tag_text",
    "mov_tag_text",
    "mov_tags",
    "make_simple_mkv",
    "mkv_meta",
    "mkv_tag_text",
    "mkv_tags",
    "dedup_images",
    "phash_band_candidates",
    "phash_df",
    "phash_from_pixels",
    "phash_gray_expr",
    "phash_neardup_pairs",
    "c4_clean_df",
    "redact_pii_df",
    "remove_boilerplate_lines",
    "gopher_rules_df",
    "gopher_repetition_arrow_df",
    "gopher_repetition_df",
    "detect_format",
    "extract_text",
    "extract_text_bytes",
    "make_simple_html",
    "make_simple_pdf",
    "with_extracted_text",
    "register_sql_functions",
    "bpe_ish_token_count",
    "fingerprint",
    "lang_id",
    "quality_score",
    "winnow_fingerprints_df",
    "ws_token_count",
    "normalize_l2",
    "parse_vector",
]
