"""Keyed upsert — the reference's fact MERGE (J6), Spark-native.

Reference: after the delta fact load lands in a staging table, a
BigQuery `MERGE ... WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN
INSERT` reconciles it into `T_FACT_Events`
(`Delta Load Scripts/dw2_delta_load2.py:101-131,398-404`).

Spark-native rendering without any lakehouse dependency: a full-outer
join on the key with per-column `coalesce(updates.c, base.c)` — updates
win on match, inserts pass through, unmatched base rows survive. On a
cluster with Delta Lake/Iceberg available, swap `merge_upsert` for
`MERGE INTO` behind the same signature; semantics here are identical
for whole-row updates.

Scale note: this is a shuffle join on the merge key — the same cost
MERGE INTO pays. For 100 TB facts, partition the stored fact by a
stable key prefix (e.g. ID_date_ID) so the rewrite touches only
affected partitions; `merge_upsert_partitioned` narrows the rewrite to
partitions present in the updates (classic dynamic-partition-overwrite
upsert).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """UPDATE matched (updates win, whole row), INSERT not-matched."""
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"merge_upsert requires identical columns; base-only="
            f"{set(base.columns) - set(updates.columns)} "
            f"updates-only={set(updates.columns) - set(base.columns)}"
        )
    # presence marker instead of key null-checks: the join is null-safe
    # (eqNullSafe), so a NULL key is a legitimate matchable value and
    # u.<key>.isNotNull() would misclassify it
    b = base.alias("b")
    u = updates.withColumn("__u_present", F.lit(True)).alias("u")
    cond = None
    for k in keys:
        c = F.col(f"b.{k}").eqNullSafe(F.col(f"u.{k}"))
        cond = c if cond is None else (cond & c)
    joined = b.join(u, cond, "full_outer")
    matched = F.col("u.__u_present").isNotNull()
    out_cols = []
    for c in base.columns:
        out_cols.append(
            F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
        )
    return joined.select(*out_cols)


def merge_upsert_partitioned(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    partition_col: str,
) -> DataFrame:
    """Upsert where only base partitions present in `updates` are rewritten.

    Returns rows for the AFFECTED partitions only (write them with
    dynamic partitionOverwriteMode); untouched partitions stay on disk.
    The partition filter is a broadcast semi join on the (small)
    distinct partition list, so the base scan prunes at the source.
    """
    parts = updates.select(partition_col).distinct()
    scoped = base.join(F.broadcast(parts), [partition_col], "left_semi")
    return merge_upsert(scoped, updates, keys)


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Key-level reconciliation of two table snapshots — the
    regression diff a pipeline runs between yesterday's and today's
    build (or between a MERGE result and its oracle): one row per
    key that is `added` (right only), `removed` (left only), or
    `changed` (both sides, any compared column differs, null-safely),
    with the changed column names as a comma-joined list in column
    order. Unchanged keys are not emitted.

    One full-outer join on the keys — no second scan, no collect;
    the column comparison is a codegen expression per column.
    Null-safe semantics throughout (NULL == NULL is "same", NULL vs
    value is a change) so nullable columns never false-positive.
    """
    klist = list(keys)
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in right.columns if c not in klist
    ]
    l = left.select(
        *klist,
        F.lit(1).alias("__in_l"),
        *[F.col(c).alias(f"__l_{c}") for c in cols],
    )
    r = right.select(
        *klist,
        F.lit(1).alias("__in_r"),
        *[F.col(c).alias(f"__r_{c}") for c in cols],
    )
    j = l.join(r, klist, "full")
    diffs = [
        ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}")) for c in cols
    ]
    # no compare columns (keys-only tables): a pure key-presence diff —
    # both-sides keys are never "changed"
    any_diff = diffs[0] if diffs else F.lit(False)
    for d in diffs[1:]:
        any_diff = any_diff | d
    status = (
        F.when(F.col("__in_l").isNull(), F.lit("added"))
        .when(F.col("__in_r").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
    )
    changed_cols = F.when(
        F.col("__in_l").isNotNull() & F.col("__in_r").isNotNull(),
        F.concat_ws(",", *[F.when(d, F.lit(c)) for c, d in zip(cols, diffs)]),
    )
    return (
        j.select(*klist, status.alias("status"), changed_cols.alias("changed_cols"))
        .filter(F.col("status").isNotNull())
    )
