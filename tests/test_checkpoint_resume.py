"""Checkpoint/metrics/resume semantics: kill-and-resume, skip-if-committed,
per-partition counters (north rule resumability requirement)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from word_sense_disambiguation_spark.plans.checkpoint import (
    StageRunner,
    run_er_pipeline,
)


def test_stage_commit_and_skip(spark, tmp_path):
    r = StageRunner(spark, str(tmp_path / "run"), run_id="t1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).withColumn("x", F.col("id") * 2)

    out1 = r.stage("s1", build)
    assert out1.count() == 100
    assert calls["n"] == 1
    # second run skips the build entirely
    out2 = r.stage("s1", build)
    assert calls["n"] == 1
    assert out2.count() == 100
    # manifest recorded
    m = json.load(open(tmp_path / "run" / "s1" / "_MANIFEST.json"))
    assert m["rows"] == 100 and m["stage"] == "s1"


def test_metrics_per_partition(spark, tmp_path):
    r = StageRunner(spark, str(tmp_path / "run"), run_id="t2")
    r.stage("s1", lambda: spark.range(0, 1000).repartition(4))
    met = r.metrics()
    rows = met.filter(F.col("stage") == "s1").collect()
    assert sum(x.rows for x in rows) == 1000
    assert all(x.run_id == "t2" for x in rows)
    assert {x.partition_id for x in rows} == set(range(len(rows)))


def test_mid_stage_bucket_resume(spark, sworld, tmp_path):
    """Kill INSIDE a stage: sidecar-recorded buckets survive untouched; an
    unrecorded (partially-written) bucket dir is treated as garbage —
    deleted and rewritten — so the resumed output has no lost or duplicated
    rows. Bucket-dir existence alone must prove nothing."""
    import glob

    from word_sense_disambiguation_spark.operators.tokenize import (
        mentions_from_pages_sql,
    )

    run_dir = str(tmp_path / "run")
    pages = sworld["pages"]
    n_buckets = 8

    # simulate a mid-stage crash: buckets 0-2 committed (sidecar written
    # after their group's job succeeded), bucket 3 written ONLY PARTIALLY
    # (half its rows) with no sidecar record — the commit-phase-crash shape.
    r = StageRunner(spark, run_dir, run_id="midstage")
    stage_dir = os.path.join(run_dir, "mentions")
    data_dir = os.path.join(stage_dir, "data")
    full = mentions_from_pages_sql(pages)
    bucket = (
        F.conv(F.substring(F.md5(F.col("mention_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    ).cast("int")
    bucketed = full.withColumn("_bucket", bucket)
    bucketed.filter(F.col("_bucket") <= 2).write.mode("append").partitionBy(
        "_bucket"
    ).parquet(data_dir)
    bucketed.filter(
        (F.col("_bucket") == 3) & (F.crc32(F.col("mention_id")) % 2 == 0)
    ).write.mode("append").partitionBy("_bucket").parquet(data_dir)
    os.makedirs(stage_dir, exist_ok=True)
    with open(os.path.join(stage_dir, "_DONE_BUCKETS.json"), "w") as f:
        json.dump({"buckets": [0, 1, 2]}, f)
    assert not r.is_committed("mentions")
    done_dirs = sorted(glob.glob(os.path.join(data_dir, "_bucket=*")))
    assert len(done_dirs) == 4  # 0-2 committed + the partial 3
    mtimes = {d: os.path.getmtime(d) for d in done_dirs[:3]}
    partial_rows = spark.read.parquet(os.path.join(data_dir, "_bucket=3")).count()

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return mentions_from_pages_sql(pages)

    out = r.stage_partitioned("mentions", build, "mention_id", n_buckets=n_buckets)
    assert r.is_committed("mentions")
    assert calls["n"] == 1
    # all buckets now present; committed buckets were not rewritten
    assert len(glob.glob(os.path.join(data_dir, "_bucket=*"))) == n_buckets
    for d, t in mtimes.items():
        assert os.path.getmtime(d) == t, d
    # the partial bucket was rewritten in full (no silent undercount, no dup)
    b3 = spark.read.parquet(os.path.join(data_dir, "_bucket=3")).count()
    full_b3 = bucketed.filter(F.col("_bucket") == 3).count()
    assert partial_rows < full_b3 and b3 == full_b3
    assert out.count() == full.count()
    # resumed_buckets recorded in the manifest
    m = json.load(open(os.path.join(run_dir, "mentions", "_MANIFEST.json")))
    assert m["resumed_buckets"] == [0, 1, 2]
    # committed stage: a further call skips the build
    r.stage_partitioned("mentions", build, "mention_id", n_buckets=n_buckets)
    assert calls["n"] == 1


def test_kill_and_resume_mid_pipeline(spark, sworld, tmp_path):
    """Simulate a crash after stage 2 of 5; resume must not recompute
    committed stages and must produce identical final clusters."""
    run_dir = str(tmp_path / "er")
    pages, senses = sworld["pages"], sworld["senses"]

    # partial run: execute only the first two stages, then "crash"
    r = StageRunner(spark, run_dir, run_id="partial")
    from word_sense_disambiguation_spark.operators.tokenize import mentions_from_pages

    r.stage("mentions", lambda: mentions_from_pages(pages))
    assert r.is_committed("mentions")
    mentions_mtime = os.path.getmtime(
        os.path.join(run_dir, "mentions", "_MANIFEST.json")
    )

    # resume: full pipeline over the same run_dir
    out = run_er_pipeline(spark, pages, senses, run_dir, run_id="resumed")
    assert out["clusters"].count() > 0
    # committed stage untouched (same manifest file, same mtime)
    assert (
        os.path.getmtime(os.path.join(run_dir, "mentions", "_MANIFEST.json"))
        == mentions_mtime
    )

    # and the resumed result equals a from-scratch run
    fresh = run_er_pipeline(spark, pages, senses, str(tmp_path / "er2"), run_id="fresh")
    a = out["clusters"].select("mention_id", "entity_id")
    b = fresh["clusters"].select("mention_id", "entity_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
