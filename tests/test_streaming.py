"""Structured Streaming surfaces: batch/stream parity for windowed counts,
incremental flagship pipeline via foreachBatch with exactly-once resume."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from word_sense_disambiguation_spark.streaming.ingest import (
    stream_sense_assignments,
    stream_windowed_event_counts,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_stream_batch_parity_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "events")
    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src)

    streamed = stream_windowed_event_counts(spark, src, EVENTS_SCHEMA)
    batch = (
        spark.read.parquet(src)
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
    )
    s = streamed.select("window_start", "event_type", "n", "sum_value")
    assert s.exceptAll(batch).count() == 0
    assert batch.exceptAll(s).count() == 0


def test_stateful_stream_dedup(spark, world, tmp_path):
    """applyInPandasWithState dedup: duplicates are flagged within a batch
    AND across micro-batch restarts (state survives via checkpoint)."""
    from word_sense_disambiguation_spark.datagen import PAGES_SCHEMA, world_to_spark
    from word_sense_disambiguation_spark.streaming.stateful import stream_exact_dedup

    sw = world_to_spark(spark, world)
    pages_dir = str(tmp_path / "pages")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    half = sw["pages"].filter(
        F.col("url") < "https://synthetic.example/0000/page-0000060"
    )
    half.write.mode("append").parquet(pages_dir)
    r1 = stream_exact_dedup(spark, pages_dir, PAGES_SCHEMA, ck, out)
    n1 = r1.count()
    assert n1 == half.count()
    assert r1.filter("first_seen").count() == half.select("text").distinct().count()

    # second round: re-append the SAME pages under new urls -> all dups
    half.withColumn("url", F.concat(F.col("url"), F.lit("-copy"))).write.mode(
        "append"
    ).parquet(pages_dir)
    r2 = stream_exact_dedup(spark, pages_dir, PAGES_SCHEMA, ck, out)
    copies = r2.filter(F.col("url").endswith("-copy"))
    assert copies.count() == half.count()
    assert copies.filter("first_seen").count() == 0  # state remembered all


def test_incremental_sense_pipeline_resumes(spark, world, tmp_path):
    """Two micro-batch rounds: new files only are processed on round 2
    (checkpointed offsets), and the union equals the batch run."""
    from word_sense_disambiguation_spark.datagen import world_to_spark
    from word_sense_disambiguation_spark.plans.pipeline import sense_assignments

    sw = world_to_spark(spark, world)
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    first = sw["pages"].filter(F.col("url") < "https://synthetic.example/0000/page-0000060")
    rest = sw["pages"].filter(F.col("url") >= "https://synthetic.example/0000/page-0000060")
    first.write.mode("append").parquet(pages_dir)
    n1 = stream_sense_assignments(spark, pages_dir, sw["senses"], out_dir, ck_dir)
    assert n1 > 0

    rest.write.mode("append").parquet(pages_dir)
    n2 = stream_sense_assignments(spark, pages_dir, sw["senses"], out_dir, ck_dir)
    assert n2 > n1

    batch = sense_assignments(sw["pages"], sw["senses"]).drop("context_words")
    streamed = spark.read.parquet(out_dir)
    cols = ["mention_id", "decision", "pred_sense_id"]
    assert streamed.select(cols).exceptAll(batch.select(cols)).count() == 0
    assert batch.select(cols).exceptAll(streamed.select(cols)).count() == 0


def test_stateful_dedup_ttl_readmits(spark, tmp_path):
    """With a processing-time TTL, a hash idle past the window is evicted:
    its next arrival is first_seen again (bounded state on endless crawls).
    Within the window it still dedups."""
    import time

    from word_sense_disambiguation_spark.datagen import PAGES_SCHEMA
    from word_sense_disambiguation_spark.streaming.stateful import stream_exact_dedup

    pages_dir = str(tmp_path / "pages")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def page(url, text):
        return (url, None, None, text, "en")

    def write(rows):
        spark.createDataFrame(rows, schema=PAGES_SCHEMA).write.mode(
            "append"
        ).parquet(pages_dir)

    # window A: TTL far longer than any drain/restart latency, so the
    # dedup-within-window behavior cannot be raced by wakeup batches
    ttl_long = 120_000
    write([page("a1", "text x"), page("a2", "text x"), page("b1", "text y")])
    r1 = stream_exact_dedup(spark, pages_dir, PAGES_SCHEMA, ck, out, ttl_ms=ttl_long)
    f1 = {r.url: r.first_seen for r in r1.collect()}
    assert f1 == {"a1": True, "a2": False, "b1": True}
    write([page("a3", "text x")])
    r2 = stream_exact_dedup(spark, pages_dir, PAGES_SCHEMA, ck, out, ttl_ms=ttl_long)
    assert {r.url: r.first_seen for r in r2.collect()}["a3"] is False

    # window B (separate stream): short TTL; whether the eviction fires on
    # the tick batch or on a post-drain wakeup, the re-sent key must
    # re-admit as first_seen — that's the property under test
    p2, ck2, out2 = str(tmp_path / "p2"), str(tmp_path / "ck2"), str(tmp_path / "o2")

    def write2(rows):
        spark.createDataFrame(rows, schema=PAGES_SCHEMA).write.mode(
            "append"
        ).parquet(p2)

    ttl = 1500
    write2([page("q1", "text q")])
    r3 = stream_exact_dedup(spark, p2, PAGES_SCHEMA, ck2, out2, ttl_ms=ttl)
    assert {r.url: r.first_seen for r in r3.collect()}["q1"] is True
    time.sleep(3.0)
    write2([page("r1", "text r")])  # tick: fires the expired timeout
    stream_exact_dedup(spark, p2, PAGES_SCHEMA, ck2, out2, ttl_ms=ttl)
    write2([page("q2", "text q")])
    r5 = stream_exact_dedup(spark, p2, PAGES_SCHEMA, ck2, out2, ttl_ms=ttl)
    assert {r.url: r.first_seen for r in r5.collect()}["q2"] is True


def test_stream_attach_to_clusters_parity(spark, tmp_path):
    """Streaming incremental ER == batch incremental ER per micro-batch:
    a frozen base is clustered once; two increments arrive as separate
    files (maxFilesPerTrigger=1 -> two micro-batches); the streamed
    resolutions must equal the union of per-increment BATCH attaches
    (one code path, deterministic scoring, frozen base).

    Sized deliberately small (40-page world): the test runs the full
    pipeline DAG five times (base + 2 streamed epochs + 2 batch
    replays), so page count multiplies wall time."""
    from word_sense_disambiguation_spark.datagen import build_world, world_to_spark
    from word_sense_disambiguation_spark.operators.incremental_er import (
        attach_mentions_to_clusters,
    )
    from word_sense_disambiguation_spark.plans.checkpoint import run_er_pipeline
    from word_sense_disambiguation_spark.plans.pipeline import sense_assignments
    from word_sense_disambiguation_spark.streaming.ingest import (
        stream_attach_to_clusters,
    )

    sworld = world_to_spark(spark, build_world(n_pages=40, seed=11))
    cut1 = "https://synthetic.example/0000/page-0000028"
    cut2 = "https://synthetic.example/0000/page-0000034"
    base_pages = sworld["pages"].filter(F.col("url") < cut1)
    inc1 = sworld["pages"].filter((F.col("url") >= cut1) & (F.col("url") < cut2))
    inc2 = sworld["pages"].filter(F.col("url") >= cut2)

    base = run_er_pipeline(
        spark, base_pages, sworld["senses"], str(tmp_path / "base"), "base"
    )
    base_assignments = base["assignments"].cache()
    base_clusters = base["clusters"].select("mention_id", "entity_id").cache()

    pages_dir = str(tmp_path / "pages")
    inc1.coalesce(1).write.mode("append").parquet(pages_dir)
    inc2.coalesce(1).write.mode("append").parquet(pages_dir)

    n = stream_attach_to_clusters(
        spark,
        pages_dir,
        sworld["senses"],
        base_assignments,
        base_clusters,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )
    streamed = spark.read.parquet(str(tmp_path / "out"))
    assert n == streamed.count() > 0

    expected = None
    for inc in (inc1, inc2):
        a = sense_assignments(inc, sworld["senses"])
        r, _ = attach_mentions_to_clusters(a, base_assignments, base_clusters)
        expected = r if expected is None else expected.unionByName(r)

    cols = ["mention_id", "entity_id", "attach_source"]
    got = sorted(map(tuple, streamed.select(cols).collect()))
    want = sorted(map(tuple, expected.select(cols).collect()))
    assert got == want
    # every streamed mention is resolved exactly once
    ids = [t[0] for t in got]
    assert len(ids) == len(set(ids))
    base_assignments.unpersist()
    base_clusters.unpersist()


def test_stream_curate_increment_parity(spark, tmp_path):
    """Streaming corpus admission == the batch decision per micro-batch:
    a frozen corpus, two increment files (maxFilesPerTrigger=1 -> two
    epochs) carrying an exact dup, a near dup, a novel doc and a
    quality-reject each; the streamed decision rows must equal the
    union of per-increment BATCH quality+incremental_dedup decisions."""
    from word_sense_disambiguation_spark.operators.dedup import (
        incremental_dedup,
    )
    from word_sense_disambiguation_spark.operators.webfilters import (
        quality_rule_flags,
    )
    from word_sense_disambiguation_spark.streaming.ingest import (
        stream_curate_increment,
    )

    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(i, base_text + f" filler{i}") for i in range(10)],
        "doc_id long, text string",
    ).cache()
    corpus.count()

    def make_inc(start):
        return [
            (start, base_text + f" filler{start % 10}", "en", "web", 60),   # exact dup
            (start + 1, base_text + " fresh tail", "en", "web", 60),        # near dup
            (start + 2, "completely different words " * 3 + str(start), "fr", "wiki", 80),  # novel
            (start + 3, "tiny", "en", "web", 4),                            # quality reject
        ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inc1 = spark.createDataFrame(make_inc(100), schema)
    inc2 = spark.createDataFrame(make_inc(200), schema)
    docs_dir = str(tmp_path / "docs")
    inc1.coalesce(1).write.mode("append").parquet(docs_dir)
    inc2.coalesce(1).write.mode("append").parquet(docs_dir)

    n = stream_curate_increment(
        spark, docs_dir, corpus,
        str(tmp_path / "out"), str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )
    assert n == 8
    streamed = {
        r.doc_id: (r.keep_quality, r.status, r.matched_id)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }

    want = {}
    for inc in (inc1, inc2):
        flags = quality_rule_flags(inc, min_stop_words=0)
        keep = {r.doc_id: r.keep for r in flags.collect()}
        surv = inc.join(
            flags.filter(F.col("keep")).select("doc_id"), on="doc_id"
        )
        dd, _ = incremental_dedup(surv, corpus)
        dmap = {r.doc_id: (r.status, r.matched_id) for r in dd.collect()}
        for r in inc.collect():
            st_, mid = dmap.get(r.doc_id, (None, None))
            want[r.doc_id] = (keep[r.doc_id], st_, mid)
    assert streamed == want
    # the planted semantics actually happened
    assert streamed[100][1] == "exact_dup" and streamed[200][1] == "exact_dup"
    assert streamed[101][1] == "near_dup"
    assert streamed[102][1] == "novel"
    assert streamed[103] == (False, None, None)
    corpus.unpersist()


def test_stream_session_watermark_finalization(spark, tmp_path):
    """Append-mode session_window: sessions emit exactly once, when the
    watermark passes their end (driven here by a far-future flush
    event); the emitted finals equal the batch operator on the same
    input — the one-expression-two-modes contract."""
    import datetime as dt

    import pandas as pd

    from word_sense_disambiguation_spark.operators.temporal import (
        session_window_stats,
    )
    from word_sense_disambiguation_spark.streaming.ingest import (
        stream_session_stats,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": [
                base,
                base + dt.timedelta(seconds=1800),   # exact gap: merges
                base + dt.timedelta(seconds=3601),   # splits
                base + dt.timedelta(seconds=10),
            ],
            "user_id": [1, 1, 1, 2],
            "event_type": ["a"] * 4,
            "value": [0.0] * 4,
            "props": [""] * 4,
        }
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    d = tmp_path / "evstream"
    d.mkdir()
    ev.to_parquet(d / "part1.parquet", index=False)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    q, name = stream_session_stats(
        spark, str(d), schema, gap="30 minutes", watermark="1 hour"
    )
    try:
        q.processAllAvailable()
        n_before = spark.table(name).count()   # watermark hasn't passed
        flush = pd.DataFrame(
            {
                "event_id": [99],
                "ts": [base + dt.timedelta(days=30)],
                "user_id": [999],
                "event_type": ["a"],
                "value": [0.0],
                "props": [""],
            }
        )
        flush["ts"] = flush["ts"].astype("datetime64[us]")
        flush.to_parquet(d / "part2.parquet", index=False)
        q.processAllAvailable()
        streamed = [
            tuple(r)
            for r in spark.table(name).filter("user_id != 999").collect()
        ]
    finally:
        q.stop()
    assert n_before == 0
    sev = spark.createDataFrame(ev)
    batch = [
        tuple(r)
        for r in session_window_stats(sev, "user_id", "ts", "event_id").collect()
    ]
    assert sorted(streamed) == sorted(batch)
    assert len(batch) == 3
