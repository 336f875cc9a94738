"""Deduplication family for training-data pipelines (X1/X2 + extensions):

- ``exact_dedup``: sha2 of normalized text, keep lowest id — deterministic
  (unlike dropDuplicates, which keeps an arbitrary row).
- ``minhash_signatures`` / ``minhash_lsh_pairs``: SQL-native MinHash over
  word shingles with universal hashing, banded LSH candidate pairs. Pure
  column expressions — deterministic and oracle-checkable, and the banding
  join is an equi-join on (band, band_hash): shuffle scales with candidate
  buckets, never all-pairs.
- ``mllib_minhash_pairs``: the MLlib MinHashLSH variant (approx, rows-only
  check) for parity with the standard Spark API.
- ``jaccard_neardup_pairs``: exact n-gram Jaccard via shingle equi-join —
  the ground truth the approx paths are measured against.
- ``simhash``: 60-bit SimHash over token md5s (bit-majority), as column
  expressions; near-dup = small hamming distance.
- ``neardup_components`` / ``dedup_by_components``: the closure step —
  pairwise candidates → connected components (min-label propagation with
  pointer jumping) → one canonical doc per cluster.

Shingle hashing spec (frozen, DuckDB-reimplementable): shingle string =
``w_i w_i+1 w_i+2`` (space-joined, lowercased); shingle int x = value of
first 8 hex chars of md5 (0..2^32); h_s(x) = (x·(2s+3) + 1009·s) mod
4294967311 for seed s — products stay < 2^63, no overflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MERSENNE_P = 4294967311  # prime > 2^32


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """X1: keep the lowest-id row per sha2(normalized text) group."""
    h = F.sha2(normalized_text(F.col(text_col)), 256)
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def _shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram strings of lower(text): m tokens → m-n+1 grams."""
    toks = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != F.lit(""))
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array())
    return F.array_distinct(grams)


def _shingle_int(s: Column) -> Column:
    # first 8 md5 hex chars → 32-bit int (safe in long arithmetic)
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def shingle_df(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, hashed: bool = True,
    distinct: bool = True,
) -> DataFrame:
    """One row per (id, shingle) — distinct by default. ``hashed=True``
    maps each shingle to a 32-bit int (the MinHash input); ``hashed=False``
    keeps the raw shingle string — collision-free, for exact-Jaccard paths.

    Plan shape: tokens materialize in their own projection (interpreted
    lambdas re-evaluate inlined inputs per element — the winnowing lesson,
    functions/textstats.select_winnow); grams are built with element_at
    (no per-gram slice allocation); dedup happens post-explode as a
    hash-based dropDuplicates, not an O(m²) array_distinct per row.
    ``distinct=False`` skips dedup where multiset semantics are fine
    (MinHash minima). Distinctness is always over the RAW shingle string —
    dedup runs before hashing, so a 32-bit hash collision can't collapse
    two distinct shingles out of the set (it still maps them to one key
    downstream, which Jaccard-over-hashes tolerates by design)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != F.lit("")
    )
    staged = df.select(F.col(id_col), toks.alias("__toks"))
    tcol = F.col("__toks")
    grams = F.when(
        F.size(tcol) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tcol) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tcol, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = staged.select(F.col(id_col), F.explode(grams).alias("__shingle"))
    if distinct:
        sh = sh.dropDuplicates([id_col, "__shingle"])
    key = _shingle_int(F.col("__shingle")) if hashed else F.col("__shingle")
    return sh.select(F.col(id_col), key.alias("shingle"))


def _signature_wide(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """(id, __m0..__m{n-1}) — the MinHash signature as wide columns.

    One aggregation computes every seed's min as a separate aggregate over
    the singly-exploded shingle rows — NOT an explode of (shingle × seed),
    which multiplies the shuffle by num_hashes. Duplicate shingles don't
    change a min, so the dedup shuffle is skipped.

    Formulation note: a fully row-local variant (per-seed ``array_min`` over
    an in-row hash array) has zero shuffles but runs the hash math through
    interpreted higher-order functions — measured ~8× slower than this
    explode + groupBy shape, whose per-row expressions all stay inside
    whole-stage codegen. The shuffle it pays moves (id, 8-byte shingle)
    rows once; Tungsten handles that far better than the interpreter
    handles num_hashes × |shingles| lambda evaluations per doc.

    The shingle explode + md5 (the expensive map stage) runs BEFORE the
    first shuffle, so its parallelism equals the source's split count.
    When the source offers fewer splits than cores (one small parquet
    file — the local degenerate case), a round-robin repartition of the
    skinny (id, text) projection restores full parallelism for ~nothing;
    with splits ≥ cores (any real corpus) it's a no-op.
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    src = df.select(id_col, text_col)
    if src.rdd.getNumPartitions() < max(2, cores // 2):
        src = src.repartition(cores)
    sh = shingle_df(src, text_col, id_col, shingle_n, distinct=False)
    mins = [
        F.min(
            (F.col("shingle") * F.lit(2 * s + 3) + F.lit(1009 * s)) % F.lit(_MERSENNE_P)
        ).alias(f"__m{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*mins)


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-source contamination matrix (corpus forensics): exact
    n-gram Jaccard between every pair of sources' DISTINCT shingle
    sets — "how much does source A duplicate source B", the question
    behind mixture double-counting (two crawls of the same site) and
    benchmark-bleed triage, answered with the same frozen shingle spec
    as the doc-level Jaccard ops.

    Scale shape: distinct-per-source bounds every shingle to ≤
    |sources| rows, so the shingle equi-join emits ≤ |sources|² rows
    per shingle no matter how hot it is — the per-source rollup is
    BETTER-bounded than doc-level pairs. Output: (src_a, src_b,
    n_shared, jaccard), src_a < src_b."""
    sh = shingle_df(df, text_col, id_col, shingle_n, hashed=False)
    src_sh = (
        sh.join(df.select(id_col, group_col), id_col)
        .select(F.col(group_col).alias("src"), "shingle")
        .distinct()
    )
    sizes = src_sh.groupBy("src").agg(F.count("*").alias("sz"))
    a = src_sh.select(F.col("src").alias("src_a"), "shingle")
    b = src_sh.select(F.col("src").alias("src_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        common.join(
            sizes.select(F.col("src").alias("src_a"), F.col("sz").alias("__sa")),
            "src_a",
        )
        .join(
            sizes.select(F.col("src").alias("src_b"), F.col("sz").alias("__sb")),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("__sa") + F.col("__sb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


def lsh_plan(
    threshold: float, num_hashes: int = 16, fn_weight: float = 1.0
) -> tuple[int, int]:
    """Choose (bands, rows_per_band) for banded MinHash-LSH given a
    target Jaccard ``threshold`` — the MMDS Ch.3 tuning rule
    (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4.3,
    public): a pair with similarity s collides with probability
    P(s) = 1 − (1−s^r)^b, an S-curve whose step sits near (1/b)^(1/r).
    The plan minimizes the false-positive area ∫₀ᵗ P(s) ds plus
    ``fn_weight`` × the false-negative area ∫ₜ¹ (1 − P(s)) ds over all
    (b, r) with b·r ≤ num_hashes (numeric integration, deterministic —
    the datasketch tuning approach re-derived from the formula). Raise
    ``fn_weight`` when missing a near-dup costs more than an extra
    exact-verify candidate (the usual corpus-dedup stance). Returns
    (bands, rows_per_band) to pass to :func:`minhash_lsh_pairs` as
    ``bands=b, num_hashes=b*r``."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_hashes < 2:
        raise ValueError("num_hashes must be >= 2")
    steps = 1000
    best, best_cost = None, None
    for b in range(1, num_hashes + 1):
        for r in range(1, num_hashes // b + 1):
            fp = fn = 0.0
            for i in range(steps):
                s = (i + 0.5) / steps
                p = 1.0 - (1.0 - s**r) ** b
                if s < threshold:
                    fp += p
                else:
                    fn += 1.0 - p
            cost = (fp + fn_weight * fn) / steps
            if best_cost is None or cost < best_cost:
                best, best_cost = (b, r), cost
    return best


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature, exploded shape: (id, seed, minhash).

    min over shingles of h_seed(shingle); docs with < shingle_n words get no
    rows (no shingles → undefined signature). The (id, seed, minhash) shape
    is a cheap row-local unpivot of :func:`_signature_wide`'s columns."""
    wide = _signature_wide(df, text_col, id_col, num_hashes, shingle_n)
    stack = ", ".join(f"{s}L, __m{s}" for s in range(num_hashes))
    return wide.select(
        F.col(id_col),
        F.expr(f"stack({num_hashes}, {stack}) AS (seed, minhash)"),
    ).select(id_col, F.col("seed").cast("int"), "minhash")


def minhash_band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """The banded-LSH blocking table: one row per (id, band, band_hash).

    This IS the dedup index — docs sharing any (band, band_hash) are
    near-dup candidates. Split out of :func:`minhash_lsh_pairs` so the
    table can be PERSISTED and joined against incrementally
    (:mod:`operators.incremental`): dedup of a new batch against a seen
    corpus joins the batch's bands against this stored table instead of
    recomputing corpus signatures. One shuffle builds the signature
    (:func:`_signature_wide`); band digests are ROW-LOCAL column
    expressions over the wide signature columns (sorted "seed:min"
    strings → md5) exploded ×bands — no second aggregation."""
    rows_per_band = num_hashes // bands
    wide = _signature_wide(df, text_col, id_col, num_hashes, shingle_n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.array_join(
                        F.array_sort(
                            F.array(
                                *[
                                    F.format_string(
                                        "%d:%d", F.lit(s), F.col(f"__m{s}")
                                    )
                                    for s in range(
                                        b * rows_per_band, (b + 1) * rows_per_band
                                    )
                                ]
                            )
                        ),
                        ",",
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return wide.select(
        F.col(id_col), F.explode(band_structs).alias("__b")
    ).select(id_col, "__b.band", "__b.band_hash")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Banded-LSH candidate pairs: signatures split into ``bands`` bands of
    ``num_hashes/bands`` rows; docs sharing any band hash are candidates.

    Returns distinct (id_a < id_b). The remaining shuffles beyond the
    band table's one are the (band, band_hash) equi-join and the final
    distinct — shuffle-bounded by candidate buckets, never all-pairs."""
    banded = minhash_band_table(df, text_col, id_col, num_hashes, bands, shingle_n)
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def mllib_minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    threshold: float = 0.4,
    shingle_n: int = 3,
    num_features: int = 1 << 18,
) -> DataFrame:
    """MLlib MinHashLSH approxSimilarityJoin variant (X2). Distance is
    1 − estimated Jaccard; non-deterministic across Spark versions → checked
    by tolerance (precision/recall vs jaccard_neardup_pairs), not by hash."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = _shingles(F.col(text_col), shingle_n)
    # HashingTF needs ≥1 term; shingle-less docs get a sentinel empty gram
    feat = df.select(
        F.col(id_col),
        F.when(F.size(sh) > 0, sh).otherwise(F.array(F.lit(""))).alias("__grams"),
    )
    tf = HashingTF(inputCol="__grams", outputCol="__features", numFeatures=num_features, binary=True)
    vecs = tf.transform(feat)
    lsh = MinHashLSH(inputCol="__features", outputCol="__hashes", numHashTables=num_hashes, seed=42)
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, threshold, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def jaccard_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
    hashed: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold, via shingle equi-join:
    |A∩B| from the join, |A|,|B| from per-doc counts, J = c/(|A|+|B|−c)."""
    sh = shingle_df(df, text_col, id_col, shingle_n, hashed=hashed)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("__sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__c"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__sa"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__sb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("__c").cast("double")
            / (F.col("__sa") + F.col("__sb") - F.col("__c")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


_HEX = "0123456789abcdef"


def simhash(text: Column, bits: int = 60) -> Column:
    """SimHash over whitespace tokens: token hash = first bits/4 md5 hex
    chars as an int; output bit j is 1 iff Σ_tokens (2·bit_j(tok) − 1) > 0.
    60 bits keeps all arithmetic inside a signed long."""
    nhex = bits // 4
    toks = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != F.lit(""))
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, nhex), 16, 10).cast("long")
    )
    # ONE fold over the (md5-expensive) hash stream with an array-of-bit-sums
    # accumulator — NOT one aggregate per bit: interpreted HOF lambdas
    # re-evaluate their input per reference, so the per-bit form recomputes
    # every token md5 `bits` times (same trap select_winnow documents;
    # measured ~20× slower on the banded pair join).
    zero = F.lit(0).cast("long")
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    sums = F.aggregate(
        hashes,
        F.array_repeat(zero, bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                powers,
                lambda p: F.when(h.bitwiseAND(p) != zero, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long"),
            ),
            lambda a, d: a + d,
        ),
    )
    fp = F.aggregate(
        F.zip_with(sums, powers, lambda s, p: F.when(s > 0, p).otherwise(zero)),
        zero,
        lambda acc, x: acc + x,
    )
    return F.when(F.size(toks).isNull() | (F.size(toks) == 0), zero).otherwise(fp)


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b)).cast("long")


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 60,
    n_blocks: int | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs at hamming distance ≤ ``max_hamming``
    WITHOUT all-pairs: split the ``bits``-bit fingerprint into ``n_blocks``
    contiguous bit blocks (default ``max_hamming + 1``) — by pigeonhole,
    any pair differing in ≤ ``max_hamming`` bits matches EXACTLY on at
    least one block — candidate-join on ``(block_id, block_value)``, then
    verify candidates with the true :func:`hamming_distance`.

    Scale shape: one row-local explode (×n_blocks), one equi-join whose
    fan-out is per identical block value (near-dup clusters and small
    2^width blocks), never N². Widening blocks (fewer, larger) cuts
    collisions; the pigeonhole bound requires ``n_blocks ≥ max_hamming+1``.
    Returns (id_a, id_b, hamming), id_a < id_b, one row per pair."""
    if n_blocks is None:
        n_blocks = max_hamming + 1
    if n_blocks < max_hamming + 1:
        raise ValueError("n_blocks must be >= max_hamming + 1 (pigeonhole bound)")
    if n_blocks > bits:
        raise ValueError("n_blocks must be <= bits")
    base = df.select(F.col(id_col), simhash(F.col(text_col), bits).alias("__fp"))
    # contiguous boundaries with widths differing by <= 1 bit
    bounds = [round(i * bits / n_blocks) for i in range(n_blocks + 1)]
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                (
                    F.shiftright(F.col("__fp"), bounds[i])
                    % F.lit(1 << (bounds[i + 1] - bounds[i]))
                ).alias("block_val"),
            )
            for i in range(n_blocks)
        ]
    )
    exploded = base.select(
        F.col(id_col), F.col("__fp"), F.explode(blocks).alias("__b")
    ).select(id_col, "__fp", "__b.block_id", "__b.block_val")
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("__fp").alias("__fa"), "block_id", "block_val"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("__fp").alias("__fb"), "block_id", "block_val"
    )
    cand = (
        a.join(b, ["block_id", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__fa", "__fb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming_distance(F.col("__fa"), F.col("__fb")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark contamination check — the standard n-gram-overlap
    decontamination pass of LLM training pipelines (publicly described in
    the GPT-3 / PaLM training reports: a training document is
    contaminated if it shares any n-gram with an evaluation set;
    n = 13 is the conventional default).

    Returns ``(id, n_matches)`` for every corpus doc sharing ≥1 distinct
    n-gram with the benchmark. Shingling follows the frozen whitespace
    token spec (``shingle_df``, hashed=False: exact strings, no
    collision false-positives).

    100 TB shape: the benchmark side is an evaluation set — small by
    definition — so its distinct shingles BROADCAST, and the check is a
    map-side broadcast semi-join on the corpus shingles: no shuffle of
    corpus data at all beyond the per-doc match count (skinny id frame).
    """
    c = shingle_df(corpus, text_col, id_col, n=n, hashed=False)
    b = (
        shingle_df(
            benchmark, bench_text_col or text_col, id_col, n=n, hashed=False
        )
        .select("shingle")
        .distinct()
    )
    return (
        c.join(F.broadcast(b), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matches"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Drop contaminated docs: corpus minus :func:`ngram_contamination`
    hits (anti-join on the skinny flagged-id frame — document payloads
    never shuffle, the same shape as ``dedup_by_components``)."""
    flagged = ngram_contamination(
        corpus, benchmark, n=n, id_col=id_col, text_col=text_col,
        bench_text_col=bench_text_col,
    ).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
) -> DataFrame:
    """The contamination AUDIT (X58, r10) — the flip side of
    :func:`decontaminate`: instead of dropping training docs, report
    per BENCHMARK example how contaminated IT is, the GPT-3 appendix-C
    "clean vs dirty eval" analysis (Brown et al. 2020 measure each eval
    example's n-gram overlap with the training set and re-score on the
    clean split; PaLM reports the same per-set fractions). Returns one
    row per benchmark doc:

    - ``n_grams``: its distinct n-gram count (0 for sub-n docs);
    - ``n_matched``: how many of those appear ANYWHERE in the corpus;
    - ``overlap_frac`` = round(n_matched / n_grams, 6) (0.0 when no
      grams) — the dirtiness fraction;
    - ``n_corpus_docs``: distinct corpus docs sharing ≥1 gram (triage:
      one hot document vs diffuse leakage);
    - ``dirty``: n_matched > 0 — the GPT-3 flag.

    100 TB shape: the benchmark side is small by definition — its
    (id, shingle) frame BROADCASTS; corpus shingles stream past the
    broadcast join map-side and only the matched hits (skinny
    (bench id, corpus id, shingle) rows, bounded by benchmark size ×
    match multiplicity) shuffle into the per-example counts. The
    corpus is never re-keyed, never collected."""
    bid = bench_id_col or id_col
    b = shingle_df(
        benchmark, bench_text_col or text_col, bid, n=n, hashed=False
    ).select(F.col(bid).alias("__bid"), "shingle")
    c = shingle_df(corpus, text_col, id_col, n=n, hashed=False).select(
        F.col(id_col).alias("__cid"), "shingle"
    )
    sizes = benchmark.select(F.col(bid).alias("__bid")).join(
        b.groupBy("__bid").agg(F.count("*").cast("long").alias("n_grams")),
        "__bid",
        "left",
    ).select("__bid", F.coalesce("n_grams", F.lit(0)).alias("n_grams"))
    hits = c.join(F.broadcast(b), "shingle")
    per = hits.groupBy("__bid").agg(
        F.count_distinct("shingle").cast("long").alias("n_matched"),
        F.count_distinct("__cid").cast("long").alias("n_corpus_docs"),
    )
    joined = sizes.join(per, "__bid", "left").select(
        "__bid",
        "n_grams",
        F.coalesce("n_matched", F.lit(0).cast("long")).alias("n_matched"),
        F.coalesce("n_corpus_docs", F.lit(0).cast("long")).alias(
            "n_corpus_docs"
        ),
    )
    return joined.select(
        F.col("__bid").alias(bid),
        "n_grams",
        "n_matched",
        F.when(
            F.col("n_grams") > 0,
            F.round(
                F.col("n_matched").cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("overlap_frac"),
        "n_corpus_docs",
        (F.col("n_matched") > 0).alias("dirty"),
    )


def neardup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    small_graph_edges: int = 1 << 21,
) -> DataFrame:
    """Connected components over a near-dup pair graph: the closure step
    that turns pairwise candidates (minhash/simhash/jaccard/embedding) into
    dedup CLUSTERS. Returns ``(id, component_id)`` for every vertex in
    ``pairs``, where ``component_id`` = min id reachable — deterministic.

    Distributed algorithm: min-label propagation with pointer jumping.
    Each round (a) every vertex takes the min label over itself and its
    neighbors (one equi-join + groupBy-min on vertex id), then (b) jumps to
    its label's label (one self-join) — the doubling step that collapses
    label chains, giving O(log diameter) rounds instead of O(diameter) on
    path-shaped clusters. Per-round shuffles are keyed by vertex id only;
    nothing is ever all-pairs. Lineage is truncated per round so the
    iterative plan can't snowball: with ``checkpoint_dir`` set the rounds
    use durable ``DataFrame.checkpoint`` (state survives executor loss —
    the 1000-executor posture, where a lost executor would otherwise
    recompute the whole lineage); without it, ``localCheckpoint`` (blocks
    on executors — right for local/tested runs, fragile on a real
    cluster). Identical results either way (asserted in tests).
    Published pattern: Kiveris et al., "Connected Components in MapReduce
    and Beyond" (the star-contraction family); min-propagation + jumping is
    its simpler fixed-point cousin, adequate because near-dup graphs are
    unions of small-diameter clusters (LSH buckets are near-cliques).

    ``small_graph_edges``: below this (symmetrized) edge count the closure
    runs as a driver-side union-find instead — identical labels, several×
    less wall-clock for the typical candidate graph. The 2^21 default
    bounds the driver collect to ~32 MB of long pairs (broadcast-sized —
    the candidate GRAPH is band-collision-bounded, orders of magnitude
    smaller than the corpus, so this threshold is about driver memory,
    not corpus scale); ``0`` forces the distributed path (the unbounded-
    input escape hatch) and is plumbed through every caller
    (``dedup_by_components``, ``dedup_incremental``, ``IncrementalDedup``)
    so large deployments can disable the shortcut end-to-end.

    ``checkpoint_dir`` note: setting it temporarily mutates the
    SparkContext-GLOBAL checkpoint dir for the duration of this call and
    restores the previous value on exit (so concurrent jobs in other
    threads of the same context can observe it mid-call — give them
    distinct contexts or dirs). Checkpoint files written under it are NOT
    deleted here: the returned DataFrame reads them, so the caller owns
    retention (delete the dir once results are consumed/persisted, the
    same contract as ``Warehouse.vacuum``).
    """
    sc = pairs.sparkSession.sparkContext
    prev_opt = None
    if checkpoint_dir is not None:
        # snapshot the raw Option[String] (setCheckpointDir would both
        # mkdir a fresh UUID subdir and lose the unset case)
        prev_opt = sc._jsc.sc().checkpointDir()
        sc.setCheckpointDir(checkpoint_dir)

        def _truncate(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:

        def _truncate(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    try:
        return _neardup_components_run(
            pairs, _truncate, id_a, id_b, max_iter, small_graph_edges
        )
    finally:
        if checkpoint_dir is not None:
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(prev_opt)


def _neardup_components_run(
    pairs: DataFrame,
    _truncate,
    id_a: str,
    id_b: str,
    max_iter: int,
    small_graph_edges: int = 1 << 21,
) -> DataFrame:
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    # materialize the edge frame ONCE: every round joins against it, and
    # without this the whole upstream pair computation (e.g. the MinHash
    # band pipeline) would re-execute per iteration
    sym = _truncate(sym)
    # adaptive small-graph shortcut: candidate pair graphs are usually
    # tiny relative to the corpus (bounded by band-collision counts), and
    # below the threshold a driver-side union-find beats 3 shuffle joins ×
    # O(log diameter) rounds by ~3× wall-clock. The count is free (sym is
    # just materialized); results are IDENTICAL (min-member labels,
    # asserted against the distributed path in tests); the distributed
    # fixed-point below remains the 100 TB path and is forced with
    # ``small_graph_edges=0``.
    if small_graph_edges and sym.count() <= small_graph_edges:
        import pandas as pd

        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        # Arrow collect + plain-list zip, NOT toLocalIterator: Row-object
        # materialization dominated this path (~5 µs/edge of pickle +
        # attribute access vs ~0.05 µs for an Arrow column → list), and
        # the tuple-list createDataFrame on the way out re-paid it. The
        # union-find itself is unchanged.
        pdf = sym.toPandas()
        for a, b in zip(pdf["u"].tolist(), pdf["v"].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN so the final label is the min member
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        verts = list(parent)
        utype = sym.schema["u"].dataType
        from pyspark.sql import types as T

        schema = T.StructType(
            [T.StructField("id", utype), T.StructField("component_id", utype)]
        )
        out = pd.DataFrame(
            {"id": verts, "component_id": [find(x) for x in verts]}
        )
        return pairs.sparkSession.createDataFrame(out, schema)

    labels = sym.select(F.col("u").alias("id")).distinct().withColumn("comp", F.col("id"))
    labels = _truncate(labels)
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("comp").alias("nmin"))
        )
        # carry the previous label through the round so convergence is a
        # column predicate on the checkpointed frame, not an extra join
        stepped = (
            labels.join(nbr, labels["id"] == nbr["u"], "left")
            .select(
                labels["id"],
                labels["comp"].alias("prev"),
                F.least(labels["comp"], F.coalesce(nbr["nmin"], labels["comp"])).alias("comp"),
            )
        )
        # pointer jumping: comp <- comp's current label (labels are vertex
        # ids, so every comp value has a row)
        ptr = stepped.select(F.col("id").alias("cid"), F.col("comp").alias("ccomp"))
        jumped = _truncate(
            stepped.join(ptr, stepped["comp"] == ptr["cid"]).select(
                stepped["id"], stepped["prev"], F.col("ccomp").alias("comp")
            )
        )
        changed = jumped.filter(F.col("comp") != F.col("prev")).count()
        labels = jumped.select("id", "comp")
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("comp").alias("component_id"))


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    small_graph_edges: int = 1 << 21,
) -> DataFrame:
    """Corpus-level near-dup removal: keep one canonical row (the min id)
    per connected component of ``pairs``; rows in no pair survive untouched.
    The standard LLM-corpus fuzzy-dedup shape: candidate pairs from any X2
    operator → component closure → anti-join of the losers (skinny id-only
    frame) back onto the full corpus — document payloads never shuffle."""
    comp = neardup_components(
        pairs, id_a=id_a, id_b=id_b, small_graph_edges=small_graph_edges
    )
    losers = comp.filter(F.col("id") != F.col("component_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
