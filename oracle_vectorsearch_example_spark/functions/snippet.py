"""Search-result snippet extraction — the Oracle Text CTX_DOC.SNIPPET
analog (the UX half of keyword search: the reference's stack pairs its
vector index with Oracle Text, whose SNIPPET returns the best keyword
window per hit). For each (query, document) pair, find the ``window``-
token span containing the MOST query-term matches and return it with
the match count.

Frozen spec (engine-replayable):

- tokens: lowercase single-space split (the bm25 tokenizer), positions
  0-based; query terms are the distinct token set of the query text;
- a candidate window always starts AT a match position (sliding the
  start left of a match can only lose its leftmost match), so the
  optimal window is computed with one RANGE frame per match position:
  matches in [p, p + window); ties break toward the earliest start;
- snippet text = the document's tokens[start .. start+window) joined
  by single spaces (whitespace-normalizing, like the rest of the text
  stack).

Plan shape: doc tokens explode once (skinny (id, pos, tok) rows), the
bounded query-term frame broadcasts, the per-pair best window is a
RANGE-frame count + one row_number — every shuffle keys on (qid, doc).
The final text slice re-joins the token-array frame on id. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snippet_df(
    docs: DataFrame,
    queries: DataFrame,
    window: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
    hits: DataFrame | None = None,
) -> DataFrame:
    """(qid, doc_id, snippet, n_matches, start_pos) — the best
    ``window``-token span per (query, document) pair that shares at
    least one term. Pass ``hits`` (a (qid, doc_id) frame, e.g. BM25
    top-k) to restrict snippet computation to retrieved pairs — the
    production shape; without it every matching pair is scored."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
        ).alias("__toks"),
    )
    tok_rows = toks.select(
        id_col,
        F.posexplode("__toks").alias("pos", "tok"),
    )
    qterms = (
        queries.select(
            F.col(qid_col),
            F.explode(
                F.split(F.lower(F.col(qtext_col)), " ")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    matches = tok_rows.join(F.broadcast(qterms), "tok").select(
        qid_col, id_col, "pos"
    )
    if hits is not None:
        matches = matches.join(
            hits.select(qid_col, id_col).distinct(), [qid_col, id_col],
            "left_semi",
        )
    frame = (
        Window.partitionBy(qid_col, id_col)
        .orderBy("pos")
        .rangeBetween(0, window - 1)
    )
    scored = matches.withColumn("n_matches", F.count("*").over(frame))
    pick = Window.partitionBy(qid_col, id_col).orderBy(
        F.col("n_matches").desc(), F.col("pos").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(qid_col, id_col, F.col("pos").alias("start_pos"), "n_matches")
    )
    return (
        best.join(toks, id_col)
        .select(
            qid_col,
            id_col,
            F.concat_ws(
                " ", F.expr(f"slice(__toks, start_pos + 1, {window})")
            ).alias("snippet"),
            F.col("n_matches").cast("long").alias("n_matches"),
            F.col("start_pos").cast("long").alias("start_pos"),
        )
    )
