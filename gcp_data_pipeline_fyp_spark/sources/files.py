"""File-level sources/sinks (reference S3, S4, S10, S11, P19).

The reference runs a whole Dataflow job to glob-and-move one file
(`Full Load Scripts/move_to_archive_full_load.py`); here file ops are
driver-side (glob/rename on the local FS or any fsspec-style mount) —
no distributed compute for single-file metadata work. The CSV scan is
the Spark datasource with an explicit all-string schema, PERMISSIVE
mode, and short-row padding semantics (`stg_full_load.py:53-67`).
"""

from __future__ import annotations

import glob as _glob
import os
import re
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# the 22 USGS feed columns (stg_full_load.py:53-58)
RAW_EVENT_COLUMNS = [
    "time", "latitude", "longitude", "depth", "mag", "magType", "nst",
    "gap", "dmin", "rms", "net", "id", "updated", "place", "type",
    "horizontalError", "depthError", "magError", "magNst", "status",
    "locationSource", "magSource",
]


def latest_matching_file(pattern: str) -> str | None:
    """Glob + max(mtime) file pick (stg_full_load.py:37-48)."""
    matches = _glob.glob(pattern)
    if not matches:
        return None
    return max(matches, key=os.path.getmtime)


def read_raw_csv(
    spark: SparkSession, path: str, columns: Sequence[str] = RAW_EVENT_COLUMNS
) -> DataFrame:
    """Headered CSV -> all-string DataFrame, short rows padded with NULL.

    PERMISSIVE mode + explicit schema reproduces the reference's
    csv.reader + right-pad parse (P1). The raw line is preserved for
    the dead-letter sink as a reconstructed `original_csv_line`.
    """
    schema = StructType([StructField(c, StringType(), True) for c in columns])
    df = spark.read.options(header=True, mode="PERMISSIVE").schema(schema).csv(path)
    return df.withColumn(
        "original_csv_line",
        F.concat_ws(",", *[F.coalesce(F.col(c), F.lit("")) for c in columns]),
    )


def write_rejected(rejected: DataFrame, base_path: str, run_id: str) -> str:
    """Dead-letter CSV-line sink under REJECTED/<run_id>/ (S10)."""
    out = os.path.join(base_path, "REJECTED", run_id)
    rejected.select(F.col("original_csv_line").alias("value")).write.mode(
        "overwrite"
    ).text(out)
    return out


_FULL_RE = re.compile(r"whole_month_(\d{2}|\d{6})")
_DELTA_RE = re.compile(r"all_day_(\d{8})[-_]\d{6}")


def archive_date_from_filename(filename: str) -> str | None:
    """P19: regex-extract the load date token used as archive partition."""
    m = _FULL_RE.search(filename) or _DELTA_RE.search(filename)
    return m.group(1) if m else None


def archive_file(src_path: str, archive_root: str, mode: str) -> str:
    """Move a raw file to ARCHIVE/{FULL_LOAD|DELTA_LOAD}/<date>/archive_<name> (S11)."""
    sub = "FULL_LOAD" if mode == "full" else "DELTA_LOAD"
    name = os.path.basename(src_path)
    date_token = archive_date_from_filename(name) or "unknown"
    dest_dir = os.path.join(archive_root, "ARCHIVE", sub, date_token)
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, f"archive_{name}")
    shutil.move(src_path, dest)
    return dest
