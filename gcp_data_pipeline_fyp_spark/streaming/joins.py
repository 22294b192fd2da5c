"""Event-time interval join — one definition, batch and streaming modes.

Ad-style attribution (join a conversion to the same user's triggering
events within a time bound) is a stream-stream join in production and
a range join in backfill. This operator is ONE function body for both:
given two batch frames it is a plain range-predicate equi-join that
the DuckDB oracle verifies; given two streaming frames it applies the
event-time watermarks that let Spark bound the join state (each side
keeps only rows inside watermark + interval horizon) — the canonical
Structured Streaming stream-stream join pattern.

Scale notes: the join shuffles both sides on the key columns; state
size in streaming mode is O(rows within the watermark horizon per
side), so the `*_watermark` arguments are the knobs that cap executor
memory. Batch-vs-stream equivalence is asserted in
tests/test_streaming.py by feeding identical rows through both modes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    max_delay_secs: int,
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Rows of `left` joined to `right` rows with the same keys whose
    `right_ts` falls in (left_ts, left_ts + max_delay_secs].

    Streaming inputs must pass both watermarks (state bound); batch
    inputs ignore them. Right-side non-key columns come back
    `right_prefix`-renamed.
    """
    if left.isStreaming and left_watermark:
        left = left.withWatermark(left_ts, left_watermark)
    if right.isStreaming and right_watermark:
        right = right.withWatermark(right_ts, right_watermark)
    renames = {
        c: f"{right_prefix}{c}" for c in right.columns if c not in keys
    }
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r_ts = renames[right_ts]
    cond = F.lit(True)
    for k in keys:
        cond = cond & (left[k] == r[k])
    cond = (
        cond
        & (F.col(r_ts) > F.col(left_ts))
        & (
            F.col(r_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay_secs} SECONDS")
        )
    )
    return left.join(r, cond).drop(*[r[k] for k in keys])
