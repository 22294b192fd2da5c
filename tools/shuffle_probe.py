#!/usr/bin/env python3
"""Shuffle-byte evidence for the digest-keyed exact dedup.

Measures (via the Spark UI REST API) the shuffle WRITE bytes of the
duplicate-stats aggregation in two shapes over the same documents
table:

- raw-key:    groupBy(text)            — the text column IS the
              shuffle key, so every document body crosses the wire;
- digest-key: groupBy(md5-digest)      — the key is 32 bytes; when the
              caller doesn't select the text column Catalyst prunes it
              from the aggregate entirely, so shuffled bytes collapse
              to digest + id + count.

At 100 TB the raw-key shape shuffles ~corpus-size bytes; the
digest-key shape shuffles a small constant per document. This probe
prints both byte counts and the ratio as one JSON line.

Usage: [SPARK_GRAFT_SF_DIR=...] python3 tools/shuffle_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gcp_data_pipeline_fyp_spark.operators.dedup import exact_dup_stats  # noqa: E402
from gcp_data_pipeline_fyp_spark.queries_util import load  # noqa: E402
from gcp_data_pipeline_fyp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _stages(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        return json.load(r)


def shuffle_write_bytes(spark, run) -> int:
    before = {s["stageId"] for s in _stages(spark)}
    run()
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in _stages(spark)
        if s["stageId"] not in before
    )


def main() -> None:
    spark = get_spark(
        app_name="shuffle-probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.ui.enabled": "true"},
    )
    docs = load(spark, SF_DIR, "documents", spread=True)

    def raw_key():
        (
            docs.groupBy("text")
            .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dupes"))
            .select("keep_id", "n_dupes")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    def digest_key():
        (
            exact_dup_stats(docs, ["text"], "doc_id")
            .select("keep_id", "n_dupes")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    raw = shuffle_write_bytes(spark, raw_key)
    dig = shuffle_write_bytes(spark, digest_key)

    # heavy hitters: full-vocabulary groupBy vs sketch->candidate-only
    # verify over the SAME exploded token stream — the verify pass's
    # shuffle should carry candidate keys only, not the vocabulary
    from gcp_data_pipeline_fyp_spark.functions.text import tokens  # noqa: E402
    from gcp_data_pipeline_fyp_spark.operators.frequent import heavy_hitters  # noqa: E402

    toks = docs.select(F.explode(tokens("text")).alias("tok"))

    def full_vocab():
        (
            toks.groupBy("tok")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") > 1000)
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    def sketch_verify():
        heavy_hitters(toks, "tok", 0.005).write.mode("overwrite").format(
            "noop"
        ).save()

    hh_full = shuffle_write_bytes(spark, full_vocab)
    hh_sketch = shuffle_write_bytes(spark, sketch_verify)

    # split leakage: the same audit joined on raw n-gram STRINGS vs the
    # production 16-byte digests — the digest form should shuffle a
    # small constant per gram regardless of gram text length
    from gcp_data_pipeline_fyp_spark.functions.text import shingles  # noqa: E402
    from gcp_data_pipeline_fyp_spark.operators.decontaminate import (  # noqa: E402
        split_leakage_report,
    )
    from gcp_data_pipeline_fyp_spark.operators.sampling import hash_split  # noqa: E402

    sp = hash_split(
        docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7
    )

    def leak_raw_ngrams():
        g = sp.select(
            "split", "doc_id", F.explode(shingles(tokens("text"), 8)).alias("ng")
        )
        tr = g.filter(F.col("split") == "train").select("ng").distinct()
        (
            g.filter(F.col("split") != "train")
            .join(tr, "ng", "left_semi")
            .select("split", "doc_id")
            .distinct()
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_leaked"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    def leak_digest():
        split_leakage_report(sp, "doc_id", "text", "split", n=8).write.mode(
            "overwrite"
        ).format("noop").save()

    lk_raw = shuffle_write_bytes(spark, leak_raw_ngrams)
    lk_dig = shuffle_write_bytes(spark, leak_digest)

    # ensemble blend: fused single-pass vs sequential per-scorer form
    # over the SAME events frame — the fused shape's shuffle-stage
    # count must stay ~flat as scorers are added (one vector groupBy +
    # one rejoin), while the sequential form adds a distinct-collapse
    # + a corpus rejoin PER scorer
    from gcp_data_pipeline_fyp_spark.operators.evalmetrics import (  # noqa: E402
        blend_scores,
        blend_scores_sequential,
    )

    ev = load(spark, SF_DIR, "events")
    scorers = {
        "value": 1_000_000,
        "s2": 1_000_000,
        "s3": 1_000_000,
        "s4": 1_000_000,
    }
    scored = ev.select(
        "event_id",
        "value",
        (F.col("value") * 3.7 - F.col("user_id") % 11).alias("s2"),
        (F.col("event_id") % 1009).cast("double").alias("s3"),
        F.log1p(F.abs(F.col("value"))).alias("s4"),
    )

    def _stages_and_bytes(run):
        before = {s["stageId"] for s in _stages(spark)}
        run()
        new = [s for s in _stages(spark) if s["stageId"] not in before]
        shuf = [s for s in new if s.get("shuffleWriteBytes", 0) > 0]
        return len(shuf), sum(s["shuffleWriteBytes"] for s in shuf)

    blend_rows = {}
    for n in (2, 4):
        w = dict(list(scorers.items())[:n])
        for name, fn in (("fused", blend_scores), ("seq", blend_scores_sequential)):
            stages, byts = _stages_and_bytes(
                lambda: fn(scored, w).write.mode("overwrite")
                .format("noop")
                .save()
            )
            blend_rows[f"{name}_n{n}"] = {
                "shuffle_stages": stages,
                "shuffle_bytes": byts,
            }

    print(
        json.dumps(
            {
                "metric": "dedup_stats_shuffle_write_bytes",
                "raw_text_key": raw,
                "digest_key": dig,
                "ratio": round(raw / dig, 2) if dig else None,
                "heavy_hitters_full_vocab_groupby": hh_full,
                "heavy_hitters_sketch_verify": hh_sketch,
                "hh_ratio": round(hh_full / hh_sketch, 2) if hh_sketch else None,
                "leakage_raw_ngram_key": lk_raw,
                "leakage_digest_key": lk_dig,
                "leak_ratio": round(lk_raw / lk_dig, 2) if lk_dig else None,
                "blend": blend_rows,
                "sf_dir": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
