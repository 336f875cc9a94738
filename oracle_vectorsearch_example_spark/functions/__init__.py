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
    chunk_by_words,
    chunk_by_sentences_udf,
)
from oracle_vectorsearch_example_spark.functions.embedding import (
    HashingEmbedder,
    OnnxEmbedder,
    hashing_embedding,
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
    "chunk_by_words",
    "chunk_by_sentences_udf",
    "HashingEmbedder",
    "OnnxEmbedder",
    "hashing_embedding",
    "normalize_l2",
    "parse_vector",
]
