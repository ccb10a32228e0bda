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


# ---------------------------------------------------------------------------
# scd2_history: changelog -> validity intervals
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def state_log(spark):
    rows = [
        # key A: v1, v1, v2, v1 -> three intervals (middle run collapses)
        ("a", _ts(1), 1, "v1"),
        ("a", _ts(3), 2, "v1"),
        ("a", _ts(5), 3, "v2"),
        ("a", _ts(9), 4, "v1"),
        # key B: single version, current forever
        ("b", _ts(2), 5, "x"),
        # key C: equal timestamps -> tiebreak decides interval order
        ("c", _ts(4), 6, "lo"),
        ("c", _ts(4), 7, "hi"),
    ]
    return spark.createDataFrame(
        rows, "key string, ts timestamp, seq long, state string"
    )


def test_scd2_intervals_and_run_collapse(spark, state_log):
    from word_sense_disambiguation_spark.operators.cdc import scd2_history

    hist = scd2_history(state_log, ["key"], "ts", "seq", ["state"])
    rows = sorted(
        ((r.key, r.state, r.valid_from, r.valid_to, r.is_current, r.n_versions)
         for r in hist.collect()),
        key=lambda t: (t[0], t[1], t[2]),
    )
    assert rows == [
        ("a", "v1", _ts(1), _ts(5), False, 2),
        ("a", "v1", _ts(9), None, True, 1),
        ("a", "v2", _ts(5), _ts(9), False, 1),
        ("b", "x", _ts(2), None, True, 1),
        ("c", "hi", _ts(4), None, True, 1),
        ("c", "lo", _ts(4), _ts(4), False, 1),
    ]
    # intervals tile: each key's valid_to chain equals the next valid_from
    # and exactly one open interval per key — already pinned by the literal
    # expectation above; assert the invariant generically too.
    per_key = {}
    for k, _s, vf, vt, cur, _n in rows:
        per_key.setdefault(k, []).append((vf, vt, cur))
    for k, ivs in per_key.items():
        ivs.sort(key=lambda iv: (iv[0], iv[2]))  # (valid_from, is_current)
        assert sum(1 for _vf, vt, _c in ivs if vt is None) == 1
        for (vf1, vt1, _), (vf2, _vt2, _) in zip(ivs, ivs[1:]):
            assert vt1 == vf2


def test_scd2_null_state_change_detection(spark):
    """NULL -> value and value -> NULL are changes; NULL -> NULL is not
    (null-safe struct comparison)."""
    from word_sense_disambiguation_spark.operators.cdc import scd2_history

    rows = [
        ("k", _ts(1), 1, None),
        ("k", _ts(2), 2, None),
        ("k", _ts(3), 3, "v"),
        ("k", _ts(4), 4, None),
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, seq long, state string"
    )
    hist = scd2_history(df, ["key"], "ts", "seq", ["state"])
    got = sorted(
        ((r.state, r.valid_from, r.n_versions) for r in hist.collect()),
        key=lambda t: t[1],
    )
    assert got == [(None, _ts(1), 2), ("v", _ts(3), 1), (None, _ts(4), 1)]


def test_scd2_parallelism_invariance_and_one_exchange(spark, state_log):
    from word_sense_disambiguation_spark.operators.cdc import scd2_history

    a = scd2_history(state_log.coalesce(1), ["key"], "ts", "seq", ["state"])
    b = scd2_history(
        state_log.repartition(7), ["key"], "ts", "seq", ["state"]
    )
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    assert sorted(map(tuple, a.collect()), key=key) == sorted(
        map(tuple, b.collect()), key=key
    )
    plan = b._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    # both windows and the run aggregate share ONE key-partitioned
    # exchange (count the AQE final plan only; the repartition(7) input
    # exchange is the fixture's, not the operator's)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan
