"""Exact substring deduplication — remove duplicated PASSAGES, not just
duplicated documents (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better", arXiv:2107.06499: any substring of ≥ 50
tokens that appears more than once in the corpus is memorization fuel;
their ExactSubstr tool keeps one copy and cuts the rest). Completes the
dedup family: X1 removes identical documents, X2/X12 near-identical
ones, X10 benchmark contamination — this removes the long shared spans
that survive all of those (licenses, syndicated paragraphs, quoted
boilerplate) while keeping the surrounding original text.

The reference tool builds a monolithic suffix array; Spark-first the
same semantics decompose into ordinary relational steps over L-gram
events (a span of ≥ L duplicated tokens is exactly a run of duplicated
L-grams, so marking every token covered by a duplicated L-gram removes
precisely the maximal duplicated spans):

1. tokenize (the corpus-standard lowercase-preserving single-space
   split; reconstruction is ``' '.join`` — whitespace-normalizing, like
   the rest of the text stack);
2. every L-gram occurrence hashes to md5 of its space-joined tokens —
   one map-side transform over the token array;
3. group by hash: occurrences with count > 1 are duplicated; the
   GLOBALLY FIRST occurrence (min (doc_id, pos)) keeps its copy
   (keep-first, as in the paper);
4. every other occurrence marks its L token positions (sequence
   explode + distinct) — overlapping duplicated grams merge into
   maximal spans set-wise, no interval logic needed;
5. anti-join the marks from the token rows and reassemble each doc in
   position order (order-canonicalized collect + transform).

Shuffles: the L-gram group-by, the mark join-back, and the per-doc
reassembly — each on its natural key; document payloads cross the wire
as skinny token rows once. A pathologically frequent L-gram (the same
license block in millions of docs) is a hot hash key — the group-by
aggregates it map-side to one row; only the mark explode scales with
occurrences, and it carries (id, pos) pairs only. All JVM expressions;
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, tok) — position-indexed tokens, empties dropped."""
    return docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
            )
        ).alias("pos", "tok"),
    )


def duplicated_gram_marks(
    docs: DataFrame,
    min_tokens: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos) token positions covered by a duplicated ``min_tokens``-
    gram whose occurrence is not the corpus-first one."""
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
        ).alias("toks"),
    )
    L = int(min_tokens)
    if L < 2:
        raise ValueError(f"min_tokens must be >= 2, got {L}")
    grams = (
        toks.filter(F.size("toks") >= L)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {L}), i -> "
                    f"struct(i AS pos, md5(concat_ws(' ', "
                    f"slice(toks, i + 1, {L}))) AS h))"
                )
            ).alias("g"),
        )
        .select(id_col, "g.pos", "g.h")
    )
    firsts = grams.groupBy("h").agg(
        F.min(F.struct(id_col, "pos")).alias("keep"),
        F.count("*").alias("c"),
    ).filter(F.col("c") > 1)
    dup_occ = grams.join(firsts, "h").filter(
        F.struct(id_col, "pos") != F.col("keep")
    )
    return dup_occ.select(
        F.col(id_col),
        F.explode(F.expr(f"sequence(pos, pos + {L - 1})")).alias("pos"),
    ).distinct()


def exact_substring_dedup(
    docs: DataFrame,
    min_tokens: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    removed_col: str = "n_removed_tokens",
) -> DataFrame:
    """Cut every duplicated ≥ ``min_tokens``-token span (keep-first) out
    of the corpus: returns (id, text, n_removed_tokens) with the
    surviving tokens reassembled in order (single-space normalized).
    Documents shorter than ``min_tokens`` pass through verbatim modulo
    the whitespace normalization."""
    marks = duplicated_gram_marks(docs, min_tokens, id_col, text_col)
    tok_rows = _token_rows(docs, id_col, text_col)
    kept = tok_rows.join(marks, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_sort(collect_list(struct(pos, tok))), "
                "p -> p.tok)"
            ),
        ).alias(text_col),
        F.count("*").alias("__kept"),
    )
    totals = tok_rows.groupBy(id_col).agg(F.count("*").alias("__total"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            (
                F.col("__total") - F.coalesce(F.col("__kept"), F.lit(0))
            ).cast("long").alias(removed_col),
        )
    )
