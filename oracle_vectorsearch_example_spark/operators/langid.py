"""Language identification via multinomial Naive Bayes over hashed
character n-grams (X54, training-pipeline extension surface) — the
missing CCNet stage 1 (Wenzek et al. 2020 §4.1 runs fastText langid
before anything else; every per-language stage downstream — the
perplexity terciles' ``group_col``, the corpus ``langs=`` filter —
needs a ``lang`` column from somewhere).

Why NB over hashed char n-grams and not a fastText port: exactly the
X47 argument (operators/nb.py) — NB's fit IS per-class integer count
tables and its score is a sum of log count ratios, all exact fold math,
so the ENTIRE train+predict path replays in DuckDB for hash-golden
verification. A fastText port would carry trained float matrices no SQL
engine could re-derive. Char n-grams (not words) are the classic langid
feature (Cavnar & Trenkle 1994): scripts and orthography dominate the
trigram distribution, so even a small labeled sample separates
languages sharply.

Frozen spec (engine-replayable):

- grams: ``lower(text)`` sliced into ALL overlapping char n-grams of
  length ``n`` (default 3), positions 1..len−n+1 — spaces kept (word
  boundaries carry signal). Documents shorter than ``n`` chars yield no
  evidence and take no label (NULL from :func:`langid_df`);
- bucket: the md5-bucket idiom (operators/sampling.py) — first 8 md5
  hex chars as a BIGINT mod ``n_buckets`` (default 4096);
- score(doc, class c) = ln n_docs_c − ln n_docs
    + Σ_grams [ ln(count_c(b) + α) − ln(total_c + α·B) ]
  with the order-canonicalized fold (operators/bm25.py discipline) and
  6 dp rounding — layout-independent, oracle-reproducible;
- predict: argmax over the ROUNDED scores, ties broken by ascending
  language code — deterministic in both engines (row_number over
  (score desc, lang asc)).

Scale posture: the model is (k·B)-bounded metadata — counts ≤ k·B rows,
class table k rows — and BROADCASTS; scoring explodes the corpus to
skinny (id, pos, b) gram rows once, widens them k-fold against the
broadcast class table (k = number of languages, a handful), and
re-aggregates per (doc, lang) — one shuffle on doc id; payloads never
shuffle (:func:`langid_df` re-joins labels by id). No UDFs anywhere.

Reference anchor: the reference's chunker takes a caller-declared
``language => 'korean'`` (01_pdf_to_vector.sql:236 and
docs/utl_to_chunks.md); this operator makes that declaration derivable
from the text itself, as a real multilingual ingest would need.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["LangidModel", "langid_fit", "langid_scores", "langid_predict", "langid_df"]


def _gram_buckets(
    docs: DataFrame, id_col: str, text_col: str, n: int, n_buckets: int
) -> DataFrame:
    """(id, pos, b) hashed char-n-gram event rows — map-side only.

    Staging discipline (the select_winnow lesson, measured here too):
    the lowered text and the gram ARRAY each materialize in their own
    projection before the explode. Binding lower(text) into the
    generator's projection lets CollapseProject inline it PER GRAM —
    an O(len²) re-lowering that measured 20× slower at 20k docs.
    sequence() runs DESCENDING when start > stop, so short texts are
    guarded to an empty array."""
    staged = docs.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("__lt")
    ).withColumn(
        "__ga",
        F.when(
            F.length("__lt") >= n,
            F.transform(
                F.sequence(F.lit(1), F.length("__lt") - (n - 1)),
                lambda i: F.col("__lt").substr(i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    # posexplode_OUTER, then drop the NULL rows ourselves: the non-outer
    # generate makes InferFiltersFromGenerate push a size(arr) > 0
    # predicate below the staging projections, where it rebuilds the
    # whole gram array (re-lowering per gram) twice per row
    ev = staged.select(
        F.col(id_col), F.posexplode_outer("__ga").alias("pos", "g")
    ).filter(F.col("g").isNotNull())
    b = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")
    return ev.select(id_col, "pos", b.alias("b"))


class LangidModel(NamedTuple):
    """Fitted per-class statistics: one gram-count table bounded by
    k·n_buckets rows and one k-row class table — both broadcast-sized
    metadata for any real k."""

    counts: DataFrame  # (lang, b, c)
    classes: DataFrame  # (lang, total, n_docs)
    langs: tuple  # sorted language codes (k-bounded, collected at fit)
    total_docs: int
    n: int
    n_buckets: int
    alpha: float

    def save(self, path: str) -> str:
        """Write the model as one JSON file (registry-compatible: hand
        the path to ``ModelRegistry.load`` to catalog it like any other
        model — the S7 semantics; a langid model is bounded metadata
        exactly like IVF centroids or a PCA rotation). Counts collect
        k·B-bounded, classes k-bounded — both driver-safe by
        construction."""
        import json
        import os

        counts = {lang: [] for lang in self.langs}
        for r in self.counts.collect():
            counts[r["lang"]].append([int(r["b"]), float(r["c"])])
        for v in counts.values():
            v.sort()
        classes = {
            r["lang"]: [float(r["total"]), int(r["n_docs"])]
            for r in self.classes.collect()
        }
        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "kind": "langid_nb",
                    "langs": list(self.langs),
                    "counts": counts,
                    "classes": classes,
                    "total_docs": self.total_docs,
                    "n": self.n,
                    "n_buckets": self.n_buckets,
                    "alpha": self.alpha,
                },
                fh,
            )
        os.replace(tmp, path)  # atomic, like the registry manifest
        return path

    @classmethod
    def load(cls, spark, path: str) -> "LangidModel":
        import json

        with open(path) as fh:
            d = json.load(fh)
        counts = spark.createDataFrame(
            [
                (lang, int(b), float(c))
                for lang, rows in d["counts"].items()
                for b, c in rows
            ],
            "lang string, b int, c double",
        )
        classes = spark.createDataFrame(
            [
                (lang, float(tot), int(nd))
                for lang, (tot, nd) in d["classes"].items()
            ],
            "lang string, total double, n_docs long",
        )
        return cls(
            counts,
            classes,
            tuple(d["langs"]),
            int(d["total_docs"]),
            int(d["n"]),
            int(d["n_buckets"]),
            float(d["alpha"]),
        )


def langid_fit(
    labeled: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    n: int = 3,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    min_count: float | None = None,
    top_buckets: int | None = None,
) -> LangidModel:
    """Count hashed char-n-grams per language over a labeled sample.
    One group-by on (lang, bucket) for the counts, one on lang for the
    class table; both results are bounded metadata.

    Model compression (r10, the CCNet-style deployment knob): rare
    buckets carry little evidence but most of the model's rows —
    ``min_count`` drops (lang, bucket) cells below the count floor;
    ``top_buckets`` keeps only each language's k highest-count cells
    (ties broken by ascending bucket — deterministic in any engine).
    Pruned cells score as UNSEEN (0 + α) while ``total`` keeps the
    full unpruned gram mass, so surviving ratios stay calibrated — the
    standard count-pruning approximation, and still exact fold math:
    the prune rule is a filter/row_number over the count table, so the
    whole pruned train+predict path remains DuckDB-replayable."""
    total_docs = labeled.count()
    if total_docs == 0:
        raise ValueError("langid_fit needs at least one labeled document")
    # the labeled sample is bounded by construction (someone hand- or
    # tool-labeled it) — its skinny (id, lang) frame broadcasts, so the
    # fit-time label join never sort-merges even when the model tables
    # are recomputed lazily inside a scoring plan
    ev = _gram_buckets(labeled, id_col, text_col, n, n_buckets).join(
        F.broadcast(labeled.select(id_col, lang_col)), id_col
    )
    counts = (
        ev.groupBy(F.col(lang_col).alias("lang"), "b")
        .agg(F.count("*").cast("double").alias("c"))
    )
    classes = (
        labeled.groupBy(F.col(lang_col).alias("lang"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .join(
            F.broadcast(
                counts.groupBy("lang").agg(F.sum("c").alias("total"))
            ),
            "lang",
            "left",
        )
        .select("lang", F.coalesce("total", F.lit(0.0)).alias("total"), "n_docs")
    )
    langs = tuple(sorted(r["lang"] for r in classes.select("lang").collect()))
    # prune AFTER the class totals: total keeps the full gram mass
    if min_count is not None:
        counts = counts.filter(F.col("c") >= F.lit(float(min_count)))
    if top_buckets is not None:
        w = Window.partitionBy("lang").orderBy(
            F.col("c").desc(), F.col("b").asc()
        )
        counts = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top_buckets)
            .drop("__rn")
        )
    return LangidModel(
        counts, classes, langs, int(total_docs), n, n_buckets, float(alpha)
    )


def langid_scores(
    docs: DataFrame,
    model: LangidModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    canonical: bool = True,
) -> DataFrame:
    """(id, lang, n_grams, score) — one row per (document, class): the
    NB log-posterior (class prior + add-alpha gram log-likelihoods),
    rounded to 6 dp. Documents with no grams (shorter than n chars)
    carry no evidence and drop out.

    ``canonical=True`` (default, the golden spec) sums contributions
    with the order-canonicalized fold — bit-stable across layouts and
    engines. ``canonical=False`` (the X46 precedent) uses the plain
    distributive sum: map-side partials, whole-stage codegen, no
    collect_list — measured ~15× faster at 200k docs; scores agree to
    FP-reassociation noise (≪ the 6 dp rounding) and labels agree
    except on exact rounded ties, so it is the throughput path for
    corpus-scale gating, never for hash goldens."""
    ev = _gram_buckets(docs, id_col, text_col, model.n, model.n_buckets)
    a, nb = model.alpha, float(model.n_buckets)
    if not canonical:
        # throughput path (r14 opt): DON'T widen the gram events ×k.
        # Pivot the count table to one row per bucket with a count column
        # per class (bounded metadata: ≤ n_buckets rows), join gram events
        # against it ONCE, sum each class's log-likelihood as its own
        # aggregate, and unpivot the k scores row-locally at the end —
        # gram-event rows through the join+aggregate drop k-fold
        # (langid_50k bench: 11.3 → ~6 s at k=3). Same distributive-sum
        # contract as before: scores agree with canonical to
        # FP-reassociation noise (the per-class constant log(total+α·B)
        # is factored out of the sum — distributivity, same tolerance),
        # labels agree except on exact rounded ties.
        langs = list(model.langs)
        cls_rows = {r["lang"]: r for r in model.classes.collect()}
        consts = {
            lng: (
                math.log(cls_rows[lng]["n_docs"]) - math.log(model.total_docs),
                math.log(cls_rows[lng]["total"] + a * nb),
            )
            for lng in langs
        }
        counts_wide = model.counts.groupBy("b").agg(
            *[
                F.max(F.when(F.col("lang") == F.lit(lng), F.col("c"))).alias(
                    f"__c{i}"
                )
                for i, lng in enumerate(langs)
            ]
        )
        agg_exprs = [F.count("*").cast("long").alias("n_grams")] + [
            F.sum(
                F.log(F.coalesce(F.col(f"__c{i}"), F.lit(0.0)) + F.lit(a))
            ).alias(f"__s{i}")
            for i in range(len(langs))
        ]
        g = (
            ev.join(F.broadcast(counts_wide), "b", "left")
            .groupBy(id_col)
            .agg(*agg_exprs)
        )
        scores = F.array(
            *[
                F.struct(
                    F.lit(lng).alias("lang"),
                    F.round(
                        F.lit(consts[lng][0])
                        + F.col(f"__s{i}")
                        - F.col("n_grams").cast("double") * F.lit(consts[lng][1]),
                        6,
                    ).alias("score"),
                )
                for i, lng in enumerate(langs)
            ]
        )
        return g.select(
            id_col, "n_grams", F.explode(scores).alias("__ls")
        ).select(
            id_col,
            F.col("__ls.lang").alias("lang"),
            "n_grams",
            F.col("__ls.score").alias("score"),
        )
    # widen each gram event k-fold by exploding the k-element LITERAL
    # lang array (codegen'd Generate — a crossJoin against the k-row
    # class frame is a BroadcastNestedLoopJoin, which falls out of
    # whole-stage codegen and measured ~2× slower end-to-end), then
    # look up this class's count for the bucket (absent → 0 + alpha)
    crossed = (
        ev.withColumn(
            "lang", F.explode(F.array(*[F.lit(s) for s in model.langs]))
        )
        .join(F.broadcast(model.classes), "lang")
        .join(F.broadcast(model.counts), ["lang", "b"], "left")
    )
    contrib = (
        F.log(F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(a))
        - F.log(F.col("total") + F.lit(a * nb))
    )
    prior = F.log(F.col("n_docs").cast("double")) - F.lit(
        math.log(model.total_docs)
    )
    grouped = crossed.select(id_col, "lang", "pos", contrib.alias("lr")).groupBy(
        id_col, "lang"
    )
    agged = grouped.agg(
        F.count("*").cast("long").alias("n_grams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "lr"))),
            F.lit(0.0),
            lambda acc, x: acc + x["lr"],
        ).alias("__ll"),
    )
    return (
        agged.join(F.broadcast(model.classes), "lang")
        .select(
            id_col,
            "lang",
            "n_grams",
            F.round(prior + F.col("__ll"), 6).alias("score"),
        )
    )


def langid_predict(
    docs: DataFrame,
    model: LangidModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    canonical: bool = True,
) -> DataFrame:
    """(id, lang, n_grams, score) — the winning class per document:
    argmax over the rounded scores, ties broken by ascending language
    code (deterministic in any engine). Evidence-free documents take no
    row here (and a NULL label in :func:`langid_df`)."""
    scored = langid_scores(docs, model, id_col, text_col, canonical=canonical)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def langid_df(
    docs: DataFrame,
    model: LangidModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "lang",
    canonical: bool = True,
) -> DataFrame:
    """docs + ``out_col`` — the predicted language label, NULL for
    documents too short to carry evidence (quarantine decisions belong
    to the caller). Labels are a skinny (id, lang) frame joined back by
    id; payloads never enter the scoring shuffle. ``canonical=False``
    takes the distributive-sum throughput path (see
    :func:`langid_scores`) — right for corpus-scale labeling."""
    if out_col in docs.columns:
        raise ValueError(
            f"out_col {out_col!r} already exists in docs; "
            "rename it or pass a different out_col"
        )
    labels = langid_predict(
        docs, model, id_col, text_col, canonical=canonical
    ).select(id_col, F.col("lang").alias(out_col))
    return docs.join(labels, id_col, "left")
