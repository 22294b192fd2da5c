"""Parquet-backed warehouse replacing BigQuery tables (reference S5-S9, S12).

Each reference `ReadFromBigQuery`/`WriteToBigQuery` becomes a parquet
table under a root directory:

- full-refresh writes (WRITE_TRUNCATE) -> `mode("overwrite")`;
- appends (WRITE_APPEND) -> `mode("append")`;
- projection-pushdown query reads (S6) are just `.select(...)` — the
  parquet reader prunes columns and pushes filters at the I/O layer,
  which is what the reference hand-coded with SQL-shaped source reads;
- the staging-table lifecycle (S12) is a plain table dir create/drop.

Fact-sized tables are written partitioned (`partition_cols`) so a
1000-executor cluster gets partition pruning on date-scoped queries and
the partitioned upsert only rewrites affected partitions.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_value(
    x: Column,
    y: Column,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    bits: int = 16,
) -> Column:
    """Bit-interleaved (Morton / Z-order) key over two numeric columns.

    Each coordinate is normalized into a `bits`-bit bucket over its
    stated domain, then the bits are interleaved — points close in BOTH
    dimensions get close z-values, so a z-sorted file layout gives
    parquet min/max skipping for 2-D box predicates (lat AND lon, x AND
    y), which a single-column range layout cannot: there every file
    spans the full domain of the second column. Pure integer Catalyst
    expressions — codegen-friendly at scan speed.
    """
    scale = (1 << bits) - 1

    def bucket(c: Column, lo: float, hi: float) -> Column:
        norm = (c.cast("double") - F.lit(lo)) / F.lit(hi - lo)
        clamped = F.least(F.greatest(norm, F.lit(0.0)), F.lit(1.0))
        return F.round(clamped * scale).cast("long")

    bx, by = bucket(x, x_min, x_max), bucket(y, y_min, y_max)
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(bx, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(by, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


class Warehouse:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        """`fmt`: any columnar format Spark ships a native reader for
        ("parquet" default, "orc" supported out of the box). Every
        table operation — including the rename-promotion, compaction,
        and layout helpers, which are path-based — works unchanged;
        projection/filter pushdown and min/max skipping apply to both
        formats."""
        self.spark = spark
        self.root = root
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self.path(table))

    def read_evolved(self, table: str) -> DataFrame:
        """Schema-evolution-aware read: the schema is the UNION of
        every file footer's columns (`mergeSchema`), so columns added
        by later appends read back as NULL for pre-existing files —
        the additive-evolution contract (Delta/Iceberg's default)
        without a metastore. Plain `read` samples ONE footer and may
        miss late columns, which is also why it is the default: at
        100 TB mergeSchema reads every footer up front, a listing-
        scale cost you opt into only on evolved tables. Incompatible
        type changes across files (int -> string) still fail loudly —
        additive evolution only; widen via a rewrite."""
        return (
            self.spark.read.option("mergeSchema", True)
            .format(self.fmt)
            .load(self.path(table))
        )

    def overwrite(
        self, df: DataFrame, table: str, partition_cols: Sequence[str] | None = None
    ) -> None:
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.format(self.fmt).save(self.path(table))

    def append(
        self, df: DataFrame, table: str, partition_cols: Sequence[str] | None = None
    ) -> None:
        w = df.write.mode("append")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.format(self.fmt).save(self.path(table))

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_cols: Sequence[str]
    ) -> None:
        """Dynamic partition overwrite: only partitions present in df are replaced."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .format(self.fmt).save(self.path(table))
        )

    def drop(self, table: str) -> None:
        p = self.path(table)
        if os.path.exists(p):
            shutil.rmtree(p)

    def overwrite_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: Sequence[str],
        n_buckets: int = 32,
        sort_cols: Sequence[str] | None = None,
    ) -> None:
        """Bucketed managed table (catalog): co-located joins/aggs.

        Two tables bucketed by the same key and count join WITHOUT a
        shuffle exchange on either side — at 100 TB this is the
        difference between an in-place merge join and re-shuffling the
        fact table every query. Bucketed writes must go through
        `saveAsTable` (the catalog records bucketing metadata).
        """
        w = (
            df.write.mode("overwrite")
            .format(self.fmt)
            .bucketBy(n_buckets, *bucket_cols)
        )
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.saveAsTable(table)

    def read_table(self, table: str) -> DataFrame:
        return self.spark.table(table)

    def swap(self, staging_table: str, table: str) -> None:
        """Promote a staging table to final via rename-with-backup.

        The old table is renamed aside BEFORE the staging table moves
        into place, so a crash at any point leaves either the old or
        the new data recoverable on disk — never a window with no
        table (each os.rename is atomic on local/HDFS filesystems;
        object stores should use the copy path instead).
        """
        final = self.path(table)
        staged = self.path(staging_table)
        backup = final + ".__backup"
        if os.path.exists(backup):
            shutil.rmtree(backup)
        had_old = os.path.exists(final)
        if had_old:
            os.rename(final, backup)
        try:
            os.rename(staged, final)
        except OSError:
            if had_old:
                os.rename(backup, final)  # roll back
            raise
        if had_old:
            shutil.rmtree(backup)

    def swap_partitions(self, staging_table: str, table: str, partition_col: str) -> None:
        """Promote only the partition dirs present in staging into `table`.

        The partitioned analog of `swap`: each `col=value` directory in
        the staging table replaces its counterpart in the final table
        via the same rename-with-backup discipline; partitions absent
        from staging are never touched (their files keep their inodes —
        asserted by tests). The staging dir is dropped afterwards.
        """
        staged_root = self.path(staging_table)
        final_root = self.path(table)
        prefix = partition_col + "="
        for entry in sorted(os.listdir(staged_root)):
            staged = os.path.join(staged_root, entry)
            if not entry.startswith(prefix) or not os.path.isdir(staged):
                continue  # _SUCCESS and friends
            final = os.path.join(final_root, entry)
            backup = final + ".__backup"
            if os.path.exists(backup):
                shutil.rmtree(backup)
            had_old = os.path.exists(final)
            if had_old:
                os.rename(final, backup)
            try:
                os.rename(staged, final)
            except OSError:
                if had_old:
                    os.rename(backup, final)  # roll back
                raise
            if had_old:
                shutil.rmtree(backup)
        self.drop(staging_table)

    def drop_partitions(
        self, table: str, partition_col: str, values: Sequence
    ) -> None:
        """Remove whole `col=value` partition directories — the delete
        path for partitions a rewrite emptied ENTIRELY (a dynamic
        overwrite or `swap_partitions` can only replace partitions
        present in the written frame; an all-rows-deleted partition is
        present in neither). Idempotent: missing dirs are skipped, so
        a crashed delete converges on re-run."""
        for v in values:
            d = os.path.join(self.path(table), f"{partition_col}={v}")
            if os.path.exists(d):
                shutil.rmtree(d)

    def compact(
        self,
        table: str,
        target_file_bytes: int = 128 << 20,
        partition_col: str | None = None,
    ) -> int:
        """Small-file compaction: rewrite `table` into ~target-sized files.

        Append-heavy tables (delta loads, streaming foreachBatch) decay
        into thousands of tiny files; at 100 TB the scan's task-per-file
        overhead and the NameNode/listing pressure dominate. Compaction
        coalesces to ceil(bytes/target) files — per partition directory
        when `partition_col` is given (each month compacts
        independently; the job can run partition-at-a-time forever) —
        and promotes via the same crash-safe rename used by the delta
        path. Returns the file count after compaction.
        """
        import math

        root = self.path(table)
        staging = table + "__compacting"

        ext = f".{self.fmt}"

        def _bytes(d: str) -> int:
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _dns, fns in os.walk(d)
                for f in fns
                if f.endswith(ext)
            )

        # a zone map (operators/zonemap.py) lives inside the table dir
        # and dies with the swap; remember its stat columns so the
        # compacted layout comes back skippable
        from gcp_data_pipeline_fyp_spark.operators.zonemap import (
            build_zonemap,
            zonemap_cols_of,
        )

        zm_cols = zonemap_cols_of(self, table)
        n_out = max(1, math.ceil(_bytes(root) / target_file_bytes))
        df = self.read(table)
        if partition_col is None:
            self.overwrite(df.coalesce(n_out), staging)
            self.swap(staging, table)
        else:
            # repartition by the partition column so each directory gets
            # its own ~target-sized output files
            self.overwrite(
                df.repartition(n_out, partition_col),
                staging,
                partition_cols=[partition_col],
            )
            self.swap_partitions(staging, table, partition_col)
        if zm_cols:
            build_zonemap(self, table, zm_cols)
        return sum(
            1
            for _dp, _dns, fns in os.walk(root)
            for f in fns
            if f.endswith(ext)
        )

    def overwrite_zorder_layout(
        self,
        df: DataFrame,
        table: str,
        zcol: Column,
        n_files: int | None = None,
    ) -> None:
        """Z-ordered layout: range-partition + sort on a `zorder_value`.

        The 2-D analog of `overwrite_range_layout`: every output file
        covers a compact REGION of the (x, y) plane instead of a slab
        of one dimension, so box predicates on both columns skip whole
        files by min/max stats. The z column itself is dropped from the
        stored table (stats on the data columns do the skipping).
        """
        n = n_files or df.sparkSession.sparkContext.defaultParallelism
        tmp = df.withColumn("__z", zcol)
        (
            tmp.repartitionByRange(n, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode("overwrite")
            .format(self.fmt).save(self.path(table))
        )

    def overwrite_range_layout(
        self,
        df: DataFrame,
        table: str,
        order_cols: Sequence[str],
        n_files: int | None = None,
    ) -> None:
        """Range-partitioned, sorted layout for min/max data skipping.

        `repartitionByRange` + `sortWithinPartitions` gives each output
        file a disjoint key range, so parquet row-group min/max stats
        let any range predicate on `order_cols` skip whole files — the
        portable flavor of Z-ordering for single-dimension predicates.
        At 100 TB this is what makes `WHERE ts BETWEEN ...` read 1/1000th
        of the table instead of all of it.
        """
        n = n_files or df.sparkSession.sparkContext.defaultParallelism
        (
            df.repartitionByRange(n, *order_cols)
            .sortWithinPartitions(*order_cols)
            .write.mode("overwrite")
            .format(self.fmt).save(self.path(table))
        )

    # ----------------------------------------- versioned tables (time travel)
    def _version_dirs(self, table: str) -> list[int]:
        root = self.path(table)
        if not os.path.exists(root):
            return []
        return sorted(
            int(e[2:])
            for e in os.listdir(root)
            if e.startswith("_v") and e[2:].isdigit()
            and os.path.isdir(os.path.join(root, e))
        )

    def current_version(self, table: str) -> int | None:
        ptr = os.path.join(self.path(table), "_CURRENT")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            return int(fh.read().strip())

    def _set_current(self, table: str, version: int) -> None:
        # write-then-replace: readers see the old pointer or the new
        # one, never a torn file (os.replace is atomic)
        ptr = os.path.join(self.path(table), "_CURRENT")
        tmp = ptr + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, ptr)

    def overwrite_versioned(
        self,
        df: DataFrame,
        table: str,
        partition_cols: Sequence[str] | None = None,
        keep_versions: int = 3,
    ) -> int:
        """Snapshot-isolated overwrite: write a NEW immutable version
        directory, then flip a one-line pointer file. Returns the new
        version number.

        Plain `overwrite` deletes the old files before the new ones
        commit — at 100 TB a long-running reader mid-scan of the old
        snapshot dies, and a crashed write leaves no table at all.
        Here every version dir is immutable once written (readers that
        resolved the pointer keep reading intact files for as long as
        they like), the flip is one atomic rename, a crashed write
        leaves an orphan `_v` dir the next vacuum removes — and
        `rollback` is a pointer flip, not a data rewrite. Version dirs
        are underscore-prefixed, so a path reader pointed at the table
        ROOT sees no data files at all rather than a mix of snapshots
        — versioned tables are read via `read_versioned` only.

        The last `keep_versions` versions are retained (the new one
        included); older dirs are vacuumed unless the pointer still
        references them.
        """
        versions = self._version_dirs(table)
        new_v = (versions[-1] + 1) if versions else 1
        vpath = os.path.join(self.path(table), f"_v{new_v}")
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.format(self.fmt).save(vpath)
        self._set_current(table, new_v)
        for old in self._version_dirs(table)[:-keep_versions]:
            if old != new_v and old != self.current_version(table):
                shutil.rmtree(os.path.join(self.path(table), f"_v{old}"))
        return new_v

    def read_versioned(self, table: str, version: int | None = None) -> DataFrame:
        """Read the pointed-to snapshot (default) or a pinned older
        `version` that vacuum still retains."""
        v = version if version is not None else self.current_version(table)
        if v is None:
            raise ValueError(f"{table} has no versions")
        vpath = os.path.join(self.path(table), f"_v{v}")
        if not os.path.isdir(vpath):
            raise ValueError(f"{table} version {v} does not exist (vacuumed?)")
        return self.spark.read.format(self.fmt).load(vpath)

    def rollback(self, table: str, version: int) -> None:
        """Flip the pointer back to a retained older version — an O(1)
        metadata operation, no data rewrite. The rolled-past version
        dirs stay on disk until a later overwrite's vacuum."""
        vpath = os.path.join(self.path(table), f"_v{version}")
        if not os.path.isdir(vpath):
            raise ValueError(f"{table} version {version} does not exist")
        self._set_current(table, version)
