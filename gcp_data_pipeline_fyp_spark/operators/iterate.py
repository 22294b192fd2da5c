"""Lineage truncation for iterative DataFrame algorithms.

Iterative operators (star-contraction connected components, PageRank,
Lloyd's k-means) rebuild a frame from itself each round; without
truncation the logical plan doubles per round and planning blows up by
round ~15. Two truncation modes:

- `localCheckpoint` (default, `checkpoint_dir=None`): executor-local
  block storage. Fast (no FS round-trip) and right for local[*] and
  single-app batch runs — but NOT fault-tolerant: the blocks live only
  in executor storage, so losing an executor mid-iteration kills the
  job (lineage is gone; Spark cannot recompute).
- reliable `checkpoint(dir)`: blocks written to a checkpoint directory
  (HDFS / object store). Survives executor loss — the setting for a
  1000-executor 100 TB run, where some executor loss per hour is the
  expected case, at the cost of one FS write per iteration. See
  DEPLOY.md.

Every iterative operator takes `checkpoint_dir: str | None` and passes
it here; callers opt into reliability with one argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize `df` and truncate its lineage.

    `checkpoint_dir=None` -> eager `localCheckpoint` (fast, not
    fault-tolerant); a path -> eager reliable `checkpoint` into that
    directory (idempotently registered on the SparkContext).
    """
    if checkpoint_dir is None:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    # setCheckpointDir resolves to <dir>/<uuid>; substring-match the
    # configured prefix so repeat calls don't spawn a new uuid dir each
    cur = sc.getCheckpointDir()
    if not cur or checkpoint_dir.rstrip("/") not in cur:
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)
