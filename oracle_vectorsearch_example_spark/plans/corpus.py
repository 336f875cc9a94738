"""End-to-end training-corpus build — the §2.12 surface composed.

``build_training_corpus`` chains the individual operators into the
pipeline a 100 TB pre-training data build actually runs:

1. **fuzzy dedup** — MinHash-LSH candidate pairs → connected-component
   closure → one canonical doc per cluster (`dedup_by_components`);
2. **quality/language gate** — single-tokenize text metrics
   (`text_metrics_df`), filtered on quality score and optional language;
3. **deterministic split** — `hash_split` into train/val/test, a pure
   function of (seed, doc_id);
4. **sequence packing** — the train split concat-and-chunked into
   fixed-length packs (`pack_sequences`);
5. **atomic publish** — all output tables committed in ONE
   `Warehouse.commit` (snapshot isolation): readers see the whole corpus
   version or none of it.

Plan shape at scale: stages 2–3 are map-side column work; the shuffles
are exactly those of the member operators (dedup's band join + closure
rounds on skinny id frames, packing's one window cumsum per shard).
Document payloads cross the wire only at the final write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_training_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.0,
    langs: list[str] | None = None,
    max_dup3_frac: float | None = None,
    benchmark: DataFrame | None = None,
    contamination_ngram: int = 13,
    split_weights: dict[str, float] | None = None,
    max_tokens: int = 2048,
    n_shards: int = 8,
    seed: int = 42,
    warehouse=None,
) -> dict[str, DataFrame]:
    """Run the full corpus build; returns the output tables as DataFrames
    (``documents`` deduped+gated+split, ``packs`` for the train split,
    ``stats`` per split). If ``warehouse`` (a ``sources.txn.Warehouse``)
    is given, all three tables are committed atomically first.

    Optional gates (r4): ``max_dup3_frac`` drops docs whose duplicate
    3-gram fraction exceeds the bound (the Gopher repetition rule, a
    row-local filter); ``benchmark`` runs :func:`~..operators.dedup.
    decontaminate` against it at ``contamination_ngram`` before the
    quality gate."""
    from oracle_vectorsearch_example_spark.functions.textstats import text_metrics_df
    from oracle_vectorsearch_example_spark.operators.dedup import (
        dedup_by_components,
        minhash_lsh_pairs,
    )
    from oracle_vectorsearch_example_spark.operators.packing import pack_sequences
    from oracle_vectorsearch_example_spark.operators.sampling import hash_split

    pairs = minhash_lsh_pairs(docs, id_col=id_col, text_col=text_col)
    deduped = dedup_by_components(docs, pairs, id_col=id_col)

    if benchmark is not None:
        from oracle_vectorsearch_example_spark.operators.dedup import decontaminate

        deduped = decontaminate(
            deduped, benchmark, n=contamination_ngram,
            id_col=id_col, text_col=text_col,
        )
    if max_dup3_frac is not None:
        # staged form: the scalar dup_ngram_fraction inlines the tokenize
        # into every lambda element (measured 35x slower at sf0.1)
        from oracle_vectorsearch_example_spark.functions.textstats import (
            repetition_metrics_df,
        )

        deduped = (
            repetition_metrics_df(deduped, text_col)
            .filter(F.col("dup3_frac") <= F.lit(max_dup3_frac))
            .drop("dup2_frac", "dup3_frac", "top_word_frac")
        )

    scored = text_metrics_df(deduped, text_col)
    gate = F.col("quality") >= F.lit(quality_min)
    if langs:
        gate = gate & F.col("lang_guess").isin(langs)
    kept_ids = scored.filter(gate).select(id_col)
    gated = deduped.join(kept_ids, id_col, "left_semi")

    split = hash_split(gated, split_weights, id_col=id_col, seed=seed)
    # three outputs (documents, packs, stats) fan out from here; persist so
    # the dedup+gate upstream runs once, not once per written table
    split = split.persist()
    train = split.filter(F.col("split") == "train")
    packs = pack_sequences(
        train,
        max_tokens=max_tokens,
        id_col=id_col,
        text_col=text_col,
        n_shards=n_shards,
        seed=seed,
    )
    stats = split.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(text_col)).alias("n_chars"),
    )

    tables = {"documents": split, "packs": packs, "stats": stats}
    if warehouse is not None:
        warehouse.commit(tables)
        tables = {name: warehouse.read(name) for name in tables}
    return tables
