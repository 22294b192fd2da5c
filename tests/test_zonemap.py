"""Zone-map data skipping: build/refresh lifecycle, file-level pruning
effectiveness, and exact equality with an unpruned scan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.zonemap import (
    build_zonemap,
    prune_files,
    read_pruned,
    refresh_zonemap,
)
from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "ts", "event_type", "value"
    )
    w.overwrite_range_layout(ev, "EV", ["value"], n_files=8)
    build_zonemap(w, "EV", ["value"])
    return w


def _ids(df):
    return sorted(r["event_id"] for r in df.select("event_id").collect())


def test_zonemap_prunes_files_and_matches_full_scan(spark, wh):
    files, total = prune_files(wh, "EV", {"value": (100.0, 200.0)})
    assert total == 8
    # a narrow interval on the layout column must skip most files
    assert len(files) < total / 2
    got = read_pruned(wh, "EV", {"value": (100.0, 200.0)})
    exp = wh.read("EV").filter(F.col("value").between(100.0, 200.0))
    assert _ids(got) == _ids(exp)
    assert _ids(got)  # non-trivial interval


def test_unmapped_appends_are_read_conservatively(spark, wh):
    before = read_pruned(wh, "EV", {"value": (100.0, 200.0)}).count()
    extra = (
        wh.read("EV")
        .filter(F.col("value").between(150.0, 160.0))
        .withColumn("event_id", F.col("event_id") + 10_000_000)
    )
    n_extra = extra.count()
    assert n_extra > 0
    wh.append(extra.coalesce(1), "EV")
    # not in the map yet -> always read (pruning stays conservative)
    assert (
        read_pruned(wh, "EV", {"value": (100.0, 200.0)}).count()
        == before + n_extra
    )
    # refresh stats ONLY the new file, and pruning still matches
    assert refresh_zonemap(wh, "EV", ["value"]) == 1
    assert refresh_zonemap(wh, "EV", ["value"]) == 0  # idempotent
    files, total = prune_files(wh, "EV", {"value": (100.0, 200.0)})
    assert total == 9 and len(files) < total
    assert (
        read_pruned(wh, "EV", {"value": (100.0, 200.0)}).count()
        == before + n_extra
    )


def test_fully_pruned_interval_returns_typed_empty(spark, wh):
    df = read_pruned(wh, "EV", {"value": (1e15, 2e15)})
    assert df.count() == 0
    assert df.columns == ["event_id", "ts", "event_type", "value"]
    files, _ = prune_files(wh, "EV", {"value": (1e15, 2e15)})
    assert files == []


def test_open_ended_and_conjunctive_intervals(spark, wh):
    exp = wh.read("EV").filter(
        (F.col("value") >= 500.0) & (F.col("ts") <= F.lit("2024-02-01"))
    )
    got = read_pruned(
        wh, "EV", {"value": (500.0, None), "ts": (None, "2024-02-01")}
    )
    assert _ids(got) == _ids(exp)


def test_zonemap_on_partitioned_table(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "whp"))
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id",
        "value",
        F.to_date("ts").alias("p_day"),
    )
    w.overwrite(ev.repartition(4), "EVP", partition_cols=["p_day"])
    build_zonemap(w, "EVP", ["value"])
    got = read_pruned(w, "EVP", {"value": (0.0, 300.0)})
    exp = ev.filter(F.col("value").between(0.0, 300.0))
    assert _ids(got) == _ids(exp)
    # partition column survives the file-list read (basePath)
    assert "p_day" in got.columns
