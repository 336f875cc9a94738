from oracle_vectorsearch_example_spark.operators.search import (
    cosine_neardup_pairs,
    topk_search,
)
from oracle_vectorsearch_example_spark.operators.ivf import IvfIndex
from oracle_vectorsearch_example_spark.operators.dedup import (
    exact_dedup,
    jaccard_neardup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
)
from oracle_vectorsearch_example_spark.operators.joins import asof_join, range_join
from oracle_vectorsearch_example_spark.operators.sessionize import sessionize

__all__ = [
    "topk_search",
    "cosine_neardup_pairs",
    "IvfIndex",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "jaccard_neardup_pairs",
    "simhash",
    "asof_join",
    "range_join",
    "sessionize",
]
