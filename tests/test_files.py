"""File-utility units: glob+latest pick, archive naming (S3, S11, P19)."""

from __future__ import annotations

import os
import time

from gcp_data_pipeline_fyp_spark.sources.files import (
    archive_date_from_filename,
    archive_file,
    latest_matching_file,
)


def test_latest_matching_file(tmp_path):
    a = tmp_path / "whole_month_202401.csv"
    b = tmp_path / "whole_month_202402.csv"
    a.write_text("x")
    time.sleep(0.05)
    b.write_text("y")
    assert latest_matching_file(str(tmp_path / "whole_month_*.csv")) == str(b)
    assert latest_matching_file(str(tmp_path / "all_day_*.csv")) is None


def test_archive_date_extract():
    # move_to_archive_*.py:21-27 patterns. NB the reference's ordered
    # alternation (\d{2}|\d{6}) takes the FIRST branch, so a 6-digit
    # token yields its first two digits — replicated as observable
    # behavior (move_to_archive_full_load.py:20).
    assert archive_date_from_filename("whole_month_202403.csv") == "20"
    assert archive_date_from_filename("whole_month_03.csv") == "03"
    assert archive_date_from_filename("all_day_20240401_120000.csv") == "20240401"
    assert archive_date_from_filename("all_day_20240401-120000.csv") == "20240401"
    assert archive_date_from_filename("random.csv") is None


def test_archive_file_moves(tmp_path):
    src = tmp_path / "all_day_20240401_120000.csv"
    src.write_text("data")
    dest = archive_file(str(src), str(tmp_path), "delta")
    assert not src.exists()
    assert os.path.exists(dest)
    assert "ARCHIVE/DELTA_LOAD/20240401/archive_all_day_20240401_120000.csv" in dest


def test_feed_request_calendar():
    # cloud_function.py:20-31 — day 1 -> previous-month full, else daily
    import datetime

    from gcp_data_pipeline_fyp_spark.sources.files import feed_request_for

    url, name, mode = feed_request_for(datetime.datetime(2024, 4, 1, 3, 0))
    assert mode == "full"
    assert name == "whole_month_03.csv"
    assert "starttime=2024-03-01" in url
    url, name, mode = feed_request_for(datetime.datetime(2024, 4, 15, 13, 30, 45))
    assert mode == "delta"
    assert name == "all_day_20240415-133045.csv"
    assert url.endswith("all_day.csv")


def test_training_shard_export_deterministic(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from gcp_data_pipeline_fyp_spark.sources.export import write_training_shards

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(df, p1, ["doc_id"], n_shards=4, max_records_per_file=20)
    # different input partitioning -> identical shard membership + order
    write_training_shards(df.repartition(7), p2, ["doc_id"], n_shards=4)
    r1 = spark.read.parquet(p1)
    r2 = spark.read.parquet(p2)
    assert r1.count() == 300
    shards = sorted(
        r["shard"] for r in r1.select("shard").distinct().collect()
    )
    assert shards == [0, 1, 2, 3]
    a = {(r["shard"], r["doc_id"]) for r in r1.collect()}
    b = {(r["shard"], r["doc_id"]) for r in r2.collect()}
    assert a == b
    # record cap respected: every file holds <= 20 rows
    for f in glob.glob(p1 + "/shard=*/part-*.parquet"):
        n = spark.read.parquet(f).count()
        assert n <= 20, f


# ------------------------------------------------ JSONL source/sink
def test_jsonl_roundtrip_with_corrupt_quarantine(spark, tmp_path):
    from gcp_data_pipeline_fyp_spark.sources.jsonl import (
        read_jsonl,
        split_corrupt,
        write_jsonl,
    )

    src = tmp_path / "corpus"
    src.mkdir()
    (src / "part0.jsonl").write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
        "{torn json line\n"
        '{"doc_id": 3, "text": null, "lang": "en"}\n'
    )
    df = read_jsonl(spark, str(src), "doc_id long, text string, lang string")
    valid, corrupt = split_corrupt(df)
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in valid.collect()}
    assert rows == {
        1: ("hello world", "en"),
        2: ("bonjour", "fr"),
        3: (None, "en"),
    }
    assert [r["raw"] for r in corrupt.collect()] == ["{torn json line"]
    assert "_corrupt_record" not in valid.columns

    # write back compressed and re-read — content survives the roundtrip
    out = tmp_path / "out"
    write_jsonl(valid, str(out), compression="gzip", max_records_per_file=2)
    back = read_jsonl(
        spark, str(out), "doc_id long, text string, lang string",
        keep_corrupt=False,
    )
    assert {
        r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()
    } == rows
    import glob

    assert glob.glob(str(out / "*.gz")), "expected gzip-compressed parts"


def test_jsonl_read_is_single_pass_no_inference(spark, tmp_path):
    """Schema-pinned read must not run an inference scan: reading a
    path whose data would be expensive to infer is plan-only until an
    action, and the scan schema equals the pinned DDL exactly."""
    src = tmp_path / "c2"
    src.mkdir()
    (src / "a.jsonl").write_text('{"doc_id": 9, "text": "t"}\n')
    from gcp_data_pipeline_fyp_spark.sources.jsonl import read_jsonl

    df = read_jsonl(
        spark, str(src), "doc_id long, text string", keep_corrupt=False
    )
    assert df.schema.simpleString() == "struct<doc_id:bigint,text:string>"


def test_warehouse_orc_format(spark, tmp_path):
    """The warehouse is format-parametric: an ORC-backed instance
    round-trips overwrite/append/partitioned writes, the rename-based
    staging swap (path-level, format-agnostic) still promotes, and
    partition pruning reaches the ORC scan."""
    from pyspark.sql import functions as F

    from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="orc")
    df = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")],
        "id long, v string, part string",
    )
    wh.overwrite(df, "t", partition_cols=["part"])
    assert sorted(r["id"] for r in wh.read("t").collect()) == [1, 2, 3]
    wh.append(
        spark.createDataFrame([(4, "d", "p2")], "id long, v string, part string"),
        "t",
        partition_cols=["part"],
    )
    assert wh.read("t").count() == 4
    # files on disk really are ORC
    import glob

    files = glob.glob(str(tmp_path / "wh" / "t" / "part=p1" / "*"))
    assert any(f.endswith(".orc") for f in files), files
    # partition pruning reaches the scan
    plan = (
        wh.read("t").filter(F.col("part") == "p1")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan and "part" in plan
    # staging swap is path-based and format-agnostic
    wh.overwrite(df.withColumn("v", F.lit("swapped")), "t__staging")
    wh.swap("t__staging", "t")
    assert {r["v"] for r in wh.read("t").collect()} == {"swapped"}


def test_shard_manifest_write_and_verify(spark, tmp_path):
    """The shard integrity contract: manifest matches the written
    tree, verification is layout-independent (a recomputation over a
    different session sees identical fingerprints), and corruption —
    a deleted shard file — is detected and attributed."""
    import os
    import shutil

    from gcp_data_pipeline_fyp_spark.sources.export import (
        verify_shards,
        write_shard_manifest,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(200)], "doc_id long, text string"
    )
    p = str(tmp_path / "shards")
    write_training_shards(df, p, ["doc_id"], n_shards=4, max_records_per_file=20)
    manifest = write_shard_manifest(spark, p)
    assert manifest["total_rows"] == 200
    assert manifest["n_shards"] == 4
    assert manifest["columns"] == ["doc_id", "text"]
    assert verify_shards(spark, p) == []

    # corruption: drop one parquet file from one shard dir
    shard_dirs = sorted(
        d for d in os.listdir(p) if d.startswith("shard=")
    )
    victim_dir = os.path.join(p, shard_dirs[0])
    victim_file = sorted(
        f for f in os.listdir(victim_dir) if f.endswith(".parquet")
    )[0]
    os.remove(os.path.join(victim_dir, victim_file))
    problems = verify_shards(spark, p)
    assert len(problems) == 1 and problems[0].startswith(
        f"shard {shard_dirs[0].split('=')[1]}: n_rows"
    )

    # a fully missing shard is reported as missing
    shutil.rmtree(victim_dir)
    assert any("missing on disk" in s for s in verify_shards(spark, p))

    # schema drift is attributed ONCE, not as per-shard fingerprint noise
    import json

    mpath = os.path.join(p, "_MANIFEST.json")
    with open(mpath) as fh:
        m = json.load(fh)
    m["columns"] = ["doc_id", "renamed_text"]
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    problems = verify_shards(spark, p)
    assert len(problems) == 1 and problems[0].startswith("schema mismatch")


def test_versioned_overwrite_time_travel_rollback_vacuum(spark, tmp_path):
    """Versioned tables: each overwrite lands in a new immutable _v dir
    + pointer flip; old snapshots stay readable (time travel), rollback
    is a pointer flip, vacuum retains keep_versions, and a reader
    pointed at the table ROOT sees no data files (underscore dirs)."""
    from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    v1 = wh.overwrite_versioned(
        spark.range(5).withColumnRenamed("id", "k"), "t", keep_versions=2
    )
    v2 = wh.overwrite_versioned(
        spark.range(9).withColumnRenamed("id", "k"), "t", keep_versions=2
    )
    assert (v1, v2) == (1, 2)
    assert wh.current_version("t") == 2
    assert wh.read_versioned("t").count() == 9
    assert wh.read_versioned("t", version=1).count() == 5  # time travel

    wh.rollback("t", 1)
    assert wh.read_versioned("t").count() == 5
    wh.rollback("t", 2)

    v3 = wh.overwrite_versioned(
        spark.range(3).withColumnRenamed("id", "k"), "t", keep_versions=2
    )
    assert v3 == 3
    assert wh._version_dirs("t") == [2, 3]  # v1 vacuumed
    import pytest as _pytest

    with _pytest.raises(ValueError):
        wh.read_versioned("t", version=1)
    with _pytest.raises(ValueError):
        wh.rollback("t", 1)



def test_read_evolved_unions_footers(spark, tmp_path):
    """Columns added by later appends read back NULL for old files;
    plain read's one-footer sampling is exactly why read_evolved
    exists (additive evolution only — the contract)."""
    from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path / "evwh"))
    wh.overwrite(
        spark.createDataFrame([(1, "a")], "id long, v string"), "T"
    )
    wh.append(
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, v string, extra double"
        ),
        "T",
    )
    got = {
        r["id"]: (r["v"], r["extra"])
        for r in wh.read_evolved("T").collect()
    }
    assert got == {1: ("a", None), 2: ("b", 9.5)}
