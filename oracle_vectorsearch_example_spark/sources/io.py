"""Sources & sinks.

- ``read_table``: parquet reader for the driver test tables. ALL physical
  type drift is absorbed here, centrally, against the canonical logical
  schema (``schemas.CANONICAL_TEST_TABLES``); operators downstream assume
  canonical types. Known drift across test-data generations:
  TIMESTAMP(NANOS) readable only as bigint (``nanosAsLong``, ns→µs integer
  division — bit-identical to DuckDB's truncation), and tz-less µs
  timestamps that Spark 4 infers as TIMESTAMP_NTZ (cast to TIMESTAMP; the
  session tz is pinned UTC so the cast is deterministic and
  DuckDB-hash-identical). Unknown drift raises with the column named.
- ``read_binary_files``: the reference's external-file scan
  (``BFILENAME``/``TO_BLOB``, 01_pdf_to_vector.sql:111-115) as Spark's
  ``binaryFile`` source.
- ``validate_constraints``: PK/FK/NOT NULL as violation-count queries —
  Spark doesn't enforce constraints at write (SURVEY.md §1.3).
- ``write_table``: parquet sink with optional partitioning; per-table job
  atomicity. For the reference's multi-statement transaction + single
  COMMIT (01_pdf_to_vector.sql:116) use :class:`~.txn.Warehouse` — an
  atomic multi-table snapshot commit (manifest log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Physical-encoding coercions to a canonical dtype, keyed by
# (canonical, observed). Each maps a known historical parquet encoding of the
# test data to the canonical logical type; anything not listed is unknown
# drift and fails loudly in normalize_table.
_COERCIONS = {
    # tz-less parquet µs timestamps read as NTZ under Spark 4's
    # inferTimestampNTZ; session tz is pinned UTC so this cast is a pure
    # re-tag (identical µs value, DuckDB-hash-identical).
    ("timestamp", "timestamp_ntz"): lambda c: F.col(c).cast("timestamp"),
    # TIMESTAMP(NANOS) read as long via nanosAsLong. Integer div (not
    # float /): ns values ~1.7e18 overflow double's 53-bit mantissa and
    # would corrupt microseconds.
    ("timestamp", "bigint"): lambda c: F.expr(f"timestamp_micros({c} div 1000)"),
    # benign width drift for keys/labels
    ("int", "bigint"): lambda c: F.col(c).cast("int"),
    ("bigint", "int"): lambda c: F.col(c).cast("bigint"),
}


def normalize_table(df: DataFrame, name: str) -> DataFrame:
    """Coerce a test table to its canonical logical schema.

    Unknown tables pass through with only the generic NTZ→TIMESTAMP fix (so
    user-supplied frames still work); known tables are checked column by
    column and unknown drift raises a clear error instead of surfacing as a
    DATATYPE_MISMATCH deep inside some operator.
    """
    from oracle_vectorsearch_example_spark.schemas import CANONICAL_TEST_TABLES

    canonical = CANONICAL_TEST_TABLES.get(name)
    dtypes = dict(df.dtypes)
    if canonical is None:
        for col, dt in dtypes.items():
            if dt == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
        return df

    missing = [c for c in canonical if c not in dtypes]
    if missing:
        raise ValueError(
            f"table {name!r}: test data drift — expected column(s) {missing} "
            f"absent; found {sorted(dtypes)}. Update schemas.CANONICAL_TEST_TABLES "
            "if the contract changed intentionally."
        )
    for col, want in canonical.items():
        got = dtypes[col]
        if got == want:
            continue
        coerce = _COERCIONS.get((want, got))
        if coerce is None:
            raise ValueError(
                f"table {name!r}: test data drift — column {col!r} reads as "
                f"{got!r}, canonical type is {want!r}, and no coercion is "
                "registered. Add one to sources.io._COERCIONS or update "
                "schemas.CANONICAL_TEST_TABLES."
            )
        df = df.withColumn(col, coerce(col))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table, normalized to its canonical logical schema.

    Sets the runtime-settable legacy conf + UTC session tz so behavior is
    identical whether the session came from :func:`get_spark` or from the
    external verify driver.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return normalize_table(df, name)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register the test tables as temp views for the SQL API path."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """External binary-file scan (S1): ``binaryFile`` source.

    Output columns ``path, modificationTime, length, content:binary`` — the
    Spark shape of the reference's BFILENAME→TO_BLOB load
    (01_pdf_to_vector.sql:111-115; directory object 01_init.sql:33-34).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink. ``partition_by`` drives partition pruning downstream
    (e.g. IVF assignment tables partitioned by cluster_id)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (catalog-registered, external at ``path``).

    Two tables bucketed by the same columns into the same bucket count
    join with NO exchange — each task zips matching buckets (sort-merge
    with the sort already on disk when ``sort_cols`` == join keys). The
    co-located fact-fact join strategy for repeated large joins
    (orders ⋈ lineitem every run): pay the shuffle once at write time.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.option("path", path).format("parquet").saveAsTable(table)


def validate_constraints(
    df: DataFrame,
    pk: list[str] | None = None,
    not_null: list[str] | None = None,
    fk: tuple[DataFrame, list[str], list[str]] | None = None,
) -> dict[str, int]:
    """Constraint checks as violation counts (0 == holds).

    Mirrors the reference's declared-but-engine-enforced constraints:
    PK (01_pdf_to_vector.sql:50, :75), FK (:76), NOT NULL (:51, :68).
    """
    out: dict[str, int] = {}
    if pk:
        dup = df.groupBy(*pk).count().filter(F.col("count") > 1)
        out["pk_violations"] = dup.count()
    for c in not_null or []:
        out[f"null_{c}"] = df.filter(F.col(c).isNull()).count()
    if fk is not None:
        parent, child_cols, parent_cols = fk
        cond = [df[c] == parent[p] for c, p in zip(child_cols, parent_cols)]
        out["fk_violations"] = df.join(parent, cond, "left_anti").count()
    return out
