"""asof_join: semantics (inclusive bound, tie rules, tolerance,
direction), determinism, and the one-shuffle plan pin."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from word_sense_disambiguation_spark.operators.temporal import asof_join

T = dt.datetime


@pytest.fixture()
def lr(spark):
    L = spark.createDataFrame(
        [
            (1, 10, T(2024, 1, 1, 0, 0, 10), 1.0),
            (2, 10, T(2024, 1, 1, 0, 0, 20), 2.0),
            (3, 10, T(2024, 1, 1, 0, 0, 5), 3.0),
            (4, 20, T(2024, 1, 1, 0, 1, 0), 4.0),
            (5, 30, None, 5.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    R = spark.createDataFrame(
        [
            (100, 10, T(2024, 1, 1, 0, 0, 7), 7.0),
            (101, 10, T(2024, 1, 1, 0, 0, 20), 20.0),
            (102, 10, T(2024, 1, 1, 0, 0, 20), 21.0),
            (103, 20, T(2024, 1, 1, 0, 2, 0), 99.0),
            (104, 30, None, 1.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    return L, R


def _run(L, R, **kw):
    kw.setdefault("on", "user_id")
    kw.setdefault("right_cols", ["event_id", "value"])
    kw.setdefault("tie_col", "event_id")
    return {
        r["event_id"]: r for r in asof_join(L, R, **kw).collect()
    }


def test_asof_backward_semantics(lr):
    L, R = lr
    out = _run(L, R)
    # strict predecessor
    assert out[1]["asof_event_id"] == 100
    # inclusive <= at equal ts; tie -> LARGEST right id
    assert out[2]["asof_event_id"] == 102 and out[2]["asof_value"] == 21.0
    # nothing before -> NULLs
    assert out[3]["asof_event_id"] is None
    # right row strictly after -> no backward match
    assert out[4]["asof_event_id"] is None
    # NULL left ts matches nothing; NULL right ts rows are dropped
    assert out[5]["asof_event_id"] is None
    # left surface is preserved 1:1
    assert set(out) == {1, 2, 3, 4, 5}


def test_asof_forward_semantics(lr):
    L, R = lr
    out = _run(L, R, direction="forward")
    assert out[1]["asof_event_id"] == 101  # earliest at-or-after; min tie id
    assert out[2]["asof_event_id"] == 101
    assert out[3]["asof_event_id"] == 100
    assert out[4]["asof_event_id"] == 103
    assert out[5]["asof_event_id"] is None


def test_asof_tolerance(lr):
    L, R = lr
    out = _run(L, R, tolerance_seconds=2)
    # id 1's match is 3s old -> nulled; id 2's is 0s -> kept
    assert out[1]["asof_event_id"] is None
    assert out[2]["asof_event_id"] == 102


def test_asof_parallelism_invariant(lr):
    L, R = lr
    a = sorted(map(tuple, asof_join(
        L.repartition(5), R.repartition(3), on="user_id",
        right_cols=["event_id", "value"], tie_col="event_id").collect()))
    b = sorted(map(tuple, asof_join(
        L.coalesce(1), R.coalesce(1), on="user_id",
        right_cols=["event_id", "value"], tie_col="event_id").collect()))
    assert a == b


def test_asof_vs_inequality_join_replay(spark):
    """Randomized-shape (but seeded/deterministic) cross-check against
    the O(L*R) inequality-join + argmax reference formulation."""
    import hashlib

    def h(i, salt):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)

    Lrows = [
        (i, h(i, "lk") % 7, T(2024, 1, 1) + dt.timedelta(seconds=h(i, "lt") % 500), float(i))
        for i in range(120)
    ]
    Rrows = [
        (1000 + i, h(i, "rk") % 7, T(2024, 1, 1) + dt.timedelta(seconds=h(i, "rt") % 500), float(i))
        for i in range(80)
    ]
    L = spark.createDataFrame(Lrows, "event_id long, user_id long, ts timestamp, value double")
    R = spark.createDataFrame(Rrows, "event_id long, user_id long, ts timestamp, value double")
    got = {
        r["event_id"]: (r["asof_event_id"], r["asof_ts"])
        for r in asof_join(L, R, on="user_id",
                           right_cols=["event_id", "value"], tie_col="event_id").collect()
    }
    by_key: dict[int, list] = {}
    for rid, k, ts, _v in Rrows:
        by_key.setdefault(k, []).append((ts, rid))
    for lid, k, lts, _v in Lrows:
        cands = [(ts, rid) for ts, rid in by_key.get(k, []) if ts <= lts]
        want = max(cands) if cands else (None, None)
        assert got[lid] == (want[1], want[0]), lid


def test_asof_plan_single_exchange(spark, lr):
    """The scale pin: ONE hash exchange total (the key partitioning for
    the running window); never a join of L against R rows."""
    L, R = lr
    plan = (
        asof_join(L, R, on="user_id", right_cols=["event_id", "value"],
                  tie_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]
