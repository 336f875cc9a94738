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
)
from oracle_vectorsearch_example_spark.functions.embedding import (
    HashingEmbedder,
    OnnxEmbedder,
    hashing_embedding,
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
    "HashingEmbedder",
    "OnnxEmbedder",
    "hashing_embedding",
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
