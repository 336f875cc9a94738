"""SCD Type-2 history merge (S13, the versioned-dimension sibling of
S12's MERGE — Kimball's slowly-changing-dimension pattern, the shape
every warehouse uses to keep dimension history queryable).

A history table carries the business columns plus three system
columns: ``valid_from`` (the batch id that created the row version),
``valid_to`` (the batch id that superseded it; NULL while current) and
``is_current``. Batch ids are caller-supplied integers (a Warehouse
version, a load date serial) — integers keep every golden hash-stable
where timestamps could not be.

Apply semantics for a batch ``B`` of source rows:

- key absent from the current rows      → INSERT (from=B, to=NULL, current)
- key present, tracked columns differ   → CLOSE the old version
  (to=B, not current) and INSERT the new one
- key present, tracked columns equal    → untouched
- current key absent from the source    → untouched, unless
  ``close_missing=True`` (a full-snapshot source) closes it.

Column comparison is NULL-SAFE (NULL → NULL is "same", NULL → value is
a change) — ``eqNullSafe``, not ``=``, so a nullable attribute cannot
silently stop tracking. Duplicate source keys are rejected exactly as
in ``merge_rows`` (ORA-30926 discipline): "the latest version" must be
unique per key for is_current to mean anything.

Plan shape: the current slice joins the source on the keys
(classification), closed history passes through untouched — keyed
shuffles only, no windows, no driver loop. Catalyst rewrites the
null-safe equality into hash-joinable ``(coalesce(k), isnull(k))``
keys, so the join is a SortMergeJoin, not a nested loop
(plan-audited); it also splits the three output branches into three
SMJ passes over the CURRENT slice — at 100 TB the closed history (the
bulk) still never shuffles, and the current slice is the small part
by construction (one row per live key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"
_SYS = (VALID_FROM, VALID_TO, IS_CURRENT)

__all__ = ["scd2_init", "scd2_apply", "VALID_FROM", "VALID_TO", "IS_CURRENT"]


def scd2_init(source: DataFrame, batch_id: int) -> DataFrame:
    """The initial history: every source row becomes a current version."""
    clash = [c for c in source.columns if c in _SYS]
    if clash:
        raise ValueError(f"source columns clash with SCD system columns: {clash}")
    return source.select(
        "*",
        F.lit(batch_id).cast("bigint").alias(VALID_FROM),
        F.lit(None).cast("bigint").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )


def scd2_apply(
    history: DataFrame,
    source: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    batch_id: int,
    change_cols: list[str] | None = None,
    close_missing: bool = False,
    check_unique_source: bool = True,
) -> DataFrame:
    """One SCD2 batch (see module docstring). ``change_cols`` defaults
    to every non-key business column. Returns the full new history."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    biz = [c for c in history.columns if c not in _SYS]
    missing = [c for c in keys if c not in biz or c not in source.columns]
    if missing:
        raise ValueError(f"key columns missing from history or source: {missing}")
    extra = [c for c in source.columns if c not in biz]
    if extra:
        raise ValueError(
            f"source columns not in the history's business columns: {extra}"
        )
    lacking = [c for c in biz if c not in source.columns]
    if lacking:
        raise ValueError(f"source lacks business columns: {lacking}")
    tracked = change_cols if change_cols is not None else [
        c for c in biz if c not in keys
    ]
    bad = [c for c in tracked if c not in source.columns or c in keys]
    if bad:
        raise ValueError(f"change_cols must be non-key source columns: {bad}")
    if check_unique_source:
        dup = source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
        if dup:
            raise ValueError(
                "source has duplicate rows for key "
                f"{ {c: dup[0][c] for c in keys} } — one version per key per "
                "batch (reduce with streaming.cdc.latest_change_per_key first)"
            )

    closed = history.filter(~F.col(IS_CURRENT))
    # key presence is judged on non-nullable markers, not the keys
    # themselves (a legitimately NULL key must still classify correctly
    # under the null-safe join)
    cur = history.filter(F.col(IS_CURRENT)).withColumn("__in_cur", F.lit(True))
    src = source.select(
        *[F.col(c).alias(f"__s_{c}") for c in source.columns]
    ).withColumn("__in_src", F.lit(True))
    j = cur.join(
        src,
        on=[F.col(k).eqNullSafe(F.col(f"__s_{k}")) for k in keys],
        how="full_outer",
    )
    in_cur = F.coalesce(F.col("__in_cur"), F.lit(False))
    in_src = F.coalesce(F.col("__in_src"), F.lit(False))
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__s_{c}"))

    same = in_cur & in_src & ~differs
    missing_kept = in_cur & ~in_src & F.lit(not close_missing)
    # ONE pass over the joined frame (r14 opt): the old three
    # filter+select branches unioned three subtrees that each re-executed
    # the full-outer join (exchanges are reused, join operators are not —
    # the 2M-row join ran 3×). Each joined row now conditionally emits its
    # 0-2 output rows (a changed key emits close AND insert) as a struct
    # array, nulls compacted, exploded — same rows, one join execution.
    row_keep = F.struct(
        *[F.col(c).alias(c) for c in biz],
        F.col(VALID_FROM).alias(VALID_FROM),
        F.col(VALID_TO).alias(VALID_TO),
        F.col(IS_CURRENT).alias(IS_CURRENT),
    )
    row_close = F.struct(
        *[F.col(c).alias(c) for c in biz],
        F.col(VALID_FROM).alias(VALID_FROM),
        F.lit(batch_id).cast("bigint").alias(VALID_TO),
        F.lit(False).alias(IS_CURRENT),
    )
    row_insert = F.struct(
        *[F.col(f"__s_{c}").alias(c) for c in biz],
        F.lit(batch_id).cast("bigint").alias(VALID_FROM),
        F.lit(None).cast("bigint").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )
    emitted = F.array_compact(
        F.array(
            F.when(same | missing_kept, row_keep),
            F.when(
                in_cur & ((in_src & differs) | (F.lit(close_missing) & ~in_src)),
                row_close,
            ),
            F.when(in_src & (~in_cur | differs), row_insert),
        )
    )
    out = j.select(F.explode(emitted).alias("__r")).select(
        *[F.col(f"__r.{c}").alias(c) for c in closed.columns]
    )
    return closed.unionByName(out)
