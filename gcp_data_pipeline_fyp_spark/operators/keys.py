"""Surrogate-key assignment for dimension builds (reference A1-A5).

The reference collects every distinct dimension value to one worker
(`beam.Distinct() | ToList`, `Full Load Scripts/dw_full_load2.py:104-105`)
and enumerates `sorted(values)` from 1 (`:37-39`); the delta load
enumerates from `max_id+1` after a MAX snapshot
(`Delta Load Scripts/dw2_delta_load2.py:32-34,70-73,139-143`).

Spark rendering: `row_number()` over a window ordered by the natural
key. A global `row_number` forces a single-partition sort — acceptable
here ONLY because it runs on the post-`distinct` dimension values,
which are tiny (dozens-to-thousands of rows) even when the fact input
is 100 TB; the distinct itself is a normal shuffled aggregation.
NULL ordering pinned asc_nulls_first (SURVEY.md §7). Never
`monotonically_increasing_id` — ids must be dense and rerun-stable so
the DuckDB oracle agrees.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_surrogate_keys(
    df: DataFrame,
    natural_keys: Sequence[str],
    id_col: str,
    start: int = 1,
) -> DataFrame:
    """distinct(natural_keys) -> dense ids from `start`, ordered by key."""
    order = [F.col(k).asc_nulls_first() for k in natural_keys]
    w = Window.orderBy(*order)
    return (
        df.select(*natural_keys)
        .distinct()
        .withColumn(id_col, (F.row_number().over(w) + F.lit(start - 1)).cast("long"))
        .select(id_col, *natural_keys)
    )


def assign_surrogate_keys_multi(
    df: DataFrame,
    specs: dict[str, tuple[str, str]],
    start: int = 1,
    barrier: bool = True,
) -> dict[str, DataFrame]:
    """Several single-column dims from ONE pass over `df`.

    `specs`: dim name -> (natural key column, surrogate id column).
    Per-dim output is IDENTICAL to `assign_surrogate_keys(df, [key],
    id_col, start)` (same distinct set, same asc_nulls_first dense
    numbering) — pinned by a differential test. What changes is the
    input cost: N separate dims each re-scan and re-aggregate the
    corpus (N column scans + N distinct shuffles at 100 TB); here the
    key columns melt into (dim, value) pairs in one projection, ONE
    partially-aggregated shuffle computes every dim's distinct set,
    and the per-dim windows run over the tiny post-distinct values
    (guide §1.2: fewer passes; §2.4: shared exchange).

    Single-column string dims only — exactly the fan-out shape of the
    reference's dimension builds (dw_full_load2.py:104-105 does one
    Distinct per dim over the same ODS rows).

    `barrier` (default True) lazily localCheckpoints the shared
    distinct set so the melt computes once under the N dim consumers;
    False keeps the raw plan visible — used by the plan test that
    pins the melt's column pruning (the barrier hides the subtree
    behind a Scan ExistingRDD).
    """
    for name, (key, _id) in specs.items():
        if dict(df.dtypes).get(key) != "string":
            raise ValueError(
                f"assign_surrogate_keys_multi needs string keys; "
                f"{name}.{key} is {dict(df.dtypes).get(key)!r}"
            )
    melted = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("__dim"),
                    F.col(key).alias("__val"),
                )
                for name, (key, _id) in specs.items()
            ])
        ).alias("__e")
    ).select(F.col("__e.__dim").alias("__dim"), F.col("__e.__val").alias("__val"))
    distinct_vals = melted.distinct()
    if barrier:
        distinct_vals = distinct_vals.localCheckpoint(eager=False)
    out: dict[str, DataFrame] = {}
    for name, (key, id_col) in specs.items():
        w = Window.orderBy(F.col(key).asc_nulls_first())
        out[name] = (
            distinct_vals.filter(F.col("__dim") == name)
            .select(F.col("__val").alias(key))
            .withColumn(
                id_col,
                (F.row_number().over(w) + F.lit(start - 1)).cast("long"),
            )
            .select(id_col, key)
        )
    return out


def max_existing_id(existing_dim: DataFrame, id_col: str) -> int:
    """SELECT MAX(id) snapshot (dw2_delta_load2.py:70-73); 0 when empty."""
    row = existing_dim.agg(F.max(F.col(id_col)).alias("m")).first()
    return int(row["m"]) if row and row["m"] is not None else 0


def incremental_surrogate_keys(
    new_values: DataFrame,
    existing_dim: DataFrame,
    natural_keys: Sequence[str],
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Delta-dim build: (new_rows, full_dim).

    new_values' distinct natural keys are anti-joined against the
    existing dim (reference J4), enumerated from max_id+1 (A3 with
    offset), and unioned back (A5). The anti join is null-safe on the
    natural keys (the reference's `v not in dict` treats None as an
    ordinary key).
    """
    start = max_existing_id(existing_dim, id_col) + 1
    cond = None
    new_d = new_values.select(*natural_keys).distinct().alias("n")
    ex = existing_dim.alias("e")
    for k in natural_keys:
        c = F.col(f"n.{k}").eqNullSafe(F.col(f"e.{k}"))
        cond = c if cond is None else (cond & c)
    fresh = new_d.join(ex, cond, "left_anti")
    new_rows = assign_surrogate_keys(fresh, list(natural_keys), id_col, start=start)
    full = existing_dim.select(id_col, *natural_keys).unionByName(new_rows)
    return new_rows, full
