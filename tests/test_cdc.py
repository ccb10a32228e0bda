"""CDC latest-snapshot compaction: merge semantics, tombstones, ties,
parallelism invariance, aggregate-not-window plan."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from word_sense_disambiguation_spark.operators.cdc import latest_snapshot


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def changelog(spark):
    rows = [
        # key A: three updates, newest wins
        ("a", _ts(1), 1, "u", "v1"),
        ("a", _ts(5), 2, "u", "v2"),
        ("a", _ts(9), 3, "u", "v3"),
        # key B: delete is newest -> key disappears
        ("b", _ts(1), 4, "u", "v1"),
        ("b", _ts(8), 5, "d", None),
        # key C: delete superseded by a later upsert -> key survives
        ("c", _ts(2), 6, "d", None),
        ("c", _ts(7), 7, "u", "v9"),
        # key D: equal timestamps -> tiebreak id decides
        ("d", _ts(4), 8, "u", "lo"),
        ("d", _ts(4), 9, "u", "hi"),
    ]
    return spark.createDataFrame(
        rows, "key string, ts timestamp, seq long, op string, payload string"
    )


def test_merge_tombstone_and_tie_semantics(spark, changelog):
    snap = latest_snapshot(changelog, ["key"], "ts", "seq", op_col="op")
    got = {r.key: (r.payload, r.seq) for r in snap.collect()}
    assert got == {"a": ("v3", 3), "c": ("v9", 7), "d": ("hi", 9)}
    # without delete semantics every key survives with its newest row
    snap2 = latest_snapshot(changelog, ["key"], "ts", "seq")
    got2 = {r.key: r.seq for r in snap2.collect()}
    assert got2 == {"a": 3, "b": 5, "c": 7, "d": 9}


def test_parallelism_invariance(spark, changelog):
    a = latest_snapshot(changelog.coalesce(1), ["key"], "ts", "seq", op_col="op")
    b = latest_snapshot(
        changelog.repartition(7), ["key"], "ts", "seq", op_col="op"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_plan_is_aggregate_not_window(spark, changelog):
    """The hot-key contract: compaction is a partial-combined max_by
    aggregate (one exchange), never a row_number window that buffers a
    hot key's full history in one task."""
    snap = latest_snapshot(changelog, ["key"], "ts", "seq", op_col="op")
    plan = snap._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Window" not in plan
    assert "max_by" in plan or "MaxBy" in plan or "HashAggregate" in plan
    assert plan.count("Exchange") == 1
    assert "EvalPython" not in plan
