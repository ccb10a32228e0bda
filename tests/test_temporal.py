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


def test_range_join_semantics_and_oversized(spark):
    from word_sense_disambiguation_spark.operators.temporal import range_join

    # points at bucket boundaries (W=4): 0.0, 3.999..., 4.0, 8.0
    P = spark.createDataFrame(
        [(1, 0.0), (2, 3.9999), (3, 4.0), (4, 8.0), (5, None)],
        "p_id long, v double",
    )
    I = spark.createDataFrame(
        [
            (10, 0.0, 4.0),      # straddles bucket 0 -> 1; catches 1,2,3
            (11, 4.0, 4.0),      # degenerate-width single point; catches 3
            (12, 8.5, 7.0),      # lo > hi: matches nothing
            (13, None, 9.0),     # NULL bound: matches nothing
            (14, 0.0, 1000.0),   # 251 buckets > max 64 -> oversized
        ],
        "i_id long, lo double, hi double",
    )
    pairs, oversized = range_join(P, I, "v", "lo", "hi", bucket_width=4.0)
    got = sorted((r["p_id"], r["i_id"]) for r in pairs.collect())
    assert got == [(1, 10), (2, 10), (3, 10), (3, 11)]
    assert [r["i_id"] for r in oversized.collect()] == [14]


def test_range_join_exhaustive_replay_and_invariance(spark):
    """Seeded fixture vs python brute force, and each pair appears
    EXACTLY once (the one-bucket-per-point no-dedup argument)."""
    import hashlib

    from word_sense_disambiguation_spark.operators.temporal import range_join

    def h(i, salt):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)

    Prows = [(i, h(i, "k") % 5, (h(i, "v") % 10000) / 100.0) for i in range(150)]
    Irows = [
        (1000 + i, h(i, "ik") % 5, (h(i, "lo") % 9000) / 100.0,
         (h(i, "lo") % 9000) / 100.0 + (h(i, "w") % 800) / 100.0)
        for i in range(60)
    ]
    P = spark.createDataFrame(Prows, "p_id long, k long, v double")
    I = spark.createDataFrame(Irows, "i_id long, k long, lo double, hi double")
    pairs, oversized = range_join(P, I, "v", "lo", "hi", keys=["k"], bucket_width=2.0)
    got = sorted((r["p_id"], r["i_id"]) for r in pairs.collect())
    assert oversized.count() == 0
    want = sorted(
        (pid, iid)
        for pid, pk, v in Prows
        for iid, ik, lo, hi in Irows
        if pk == ik and lo <= v <= hi
    )
    assert got == want
    assert len(got) == len(set(got))  # exactly-once, no dedup needed
    a = sorted(map(tuple, range_join(
        P.repartition(7), I.repartition(3), "v", "lo", "hi",
        keys=["k"], bucket_width=2.0)[0].collect()))
    b = sorted(map(tuple, range_join(
        P.coalesce(1), I.coalesce(1), "v", "lo", "hi",
        keys=["k"], bucket_width=2.0)[0].collect()))
    assert a == b


def test_range_join_plan_is_equi_join(spark):
    """The scale pin: the join is a hash/SMJ equi-join on (keys, bucket)
    — never BroadcastNestedLoop or a cartesian product."""
    from word_sense_disambiguation_spark.operators.temporal import range_join

    P = spark.createDataFrame([(1, 1, 2.0)], "p_id long, k long, v double")
    I = spark.createDataFrame([(9, 1, 1.0, 3.0)], "i_id long, k long, lo double, hi double")
    pairs, _ = range_join(P, I, "v", "lo", "hi", keys=["k"])
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan), plan[:2000]


def test_time_bucket_rollup_semantics(spark):
    from word_sense_disambiguation_spark.operators.temporal import (
        time_bucket_rollup,
    )

    rows = [
        ("a", T(2024, 1, 1, 10, 0, 5), 1.50),
        ("a", T(2024, 1, 1, 10, 0, 40), 2.25),
        ("a", T(2024, 1, 1, 10, 59, 0), 4.00),
        ("a", T(2024, 1, 1, 23, 30, 0), 8.00),
        ("a", T(2024, 1, 2, 0, 0, 0), 16.00),
        ("b", T(2024, 1, 1, 10, 0, 0), None),   # null value under count
        ("b", None, 99.0),                       # null ts dropped
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = time_bucket_rollup(df, "ts", ["event_type"], "value")
    rowsd = {
        (r["event_type"], r["granularity"], r["bucket_start"]): r
        for r in out.collect()
    }
    m = rowsd[("a", "minute", T(2024, 1, 1, 10, 0))]
    assert m["n"] == 2 and m["sum_scaled"] == 150 + 225
    assert m["min_value"] == 1.5 and m["max_value"] == 2.25
    h = rowsd[("a", "hour", T(2024, 1, 1, 10, 0))]
    assert h["n"] == 3 and h["sum_scaled"] == 150 + 225 + 400
    d1 = rowsd[("a", "day", T(2024, 1, 1))]
    assert d1["n"] == 4 and d1["sum_scaled"] == 150 + 225 + 400 + 800
    assert ("a", "day", T(2024, 1, 2)) in rowsd
    # null value: counted in n, skipped by min/max/sum
    b = rowsd[("b", "minute", T(2024, 1, 1, 10, 0))]
    assert b["n"] == 1 and b["sum_scaled"] is None and b["min_value"] is None
    # null ts row is gone entirely
    assert not any(k[0] == "b" and k[1] == "day" and k[2] is None for k in rowsd)
    # cross-granularity consistency: every day's n equals the sum of its hours
    days = [(k, v) for k, v in rowsd.items() if k[1] == "day"]
    for (etype, _g, bstart), v in days:
        hsum = sum(
            vv["n"] for (et, g, bs), vv in rowsd.items()
            if et == etype and g == "hour" and bs.date() == bstart.date()
        )
        assert hsum == v["n"]


def test_time_bucket_rollup_one_scan_one_shuffle(spark):
    """The hypertable pin: grouping sets = one Expand over ONE scan and
    one hash exchange — never a scan/shuffle per granularity."""
    from word_sense_disambiguation_spark.operators.temporal import (
        time_bucket_rollup,
    )

    df = spark.createDataFrame(
        [("a", T(2024, 1, 1), 1.0)], "event_type string, ts timestamp, value double"
    )
    plan = (
        time_bucket_rollup(df, "ts", ["event_type"], "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Expand" in plan, plan[:2000]
    assert plan.count("Scan") <= 1, plan[:2000]


def test_time_bucket_rollup_parallelism_invariant(spark):
    from word_sense_disambiguation_spark.operators.temporal import (
        time_bucket_rollup,
    )

    rows = [
        ("t%d" % (i % 3), T(2024, 1, 1) + dt.timedelta(minutes=7 * i), i * 1.01)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    a = sorted(map(tuple, time_bucket_rollup(df.repartition(9), "ts", ["event_type"], "value").collect()))
    b = sorted(map(tuple, time_bucket_rollup(df.coalesce(1), "ts", ["event_type"], "value").collect()))
    assert a == b


def _hop_events(spark):
    rows = []
    for i in range(200):
        rows.append(
            (
                "t" + str(i % 3),
                dt.datetime(2024, 1, 1, 0, 0, 0)
                + dt.timedelta(seconds=37 * i + (i % 7) * 0.25),
                float(i) / 4.0,
            )
        )
    return spark.createDataFrame(rows, "event_type string, ts timestamp, value double")


def test_hopping_window_matches_builtin_window(spark):
    """Our explicit offset-explode arithmetic must reproduce Structured
    Streaming's F.window(ts, 15min, 5min) convention exactly — window
    starts AND membership counts — so the batch twin and a streaming
    deployment agree."""
    from word_sense_disambiguation_spark.operators.temporal import (
        hopping_window_agg,
    )

    ev = _hop_events(spark)
    ours = hopping_window_agg(
        ev, "ts", ["event_type"], "value", length_s=900, slide_s=300
    )
    builtin = (
        ev.groupBy(
            F.window("ts", "15 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("event_type", F.col("w.start").alias("window_start"), "n")
    )
    a = {(r.event_type, r.window_start): r.n for r in ours.collect()}
    b = {(r.event_type, r.window_start): r.n for r in builtin.collect()}
    assert a == b

    # every event is in exactly length/slide = 3 windows
    assert sum(a.values()) == 3 * ev.count()


def test_hopping_window_guard_and_plan(spark):
    from word_sense_disambiguation_spark.operators.temporal import (
        hopping_window_agg,
    )

    ev = _hop_events(spark)
    with pytest.raises(ValueError):
        hopping_window_agg(ev, "ts", ["event_type"], "value", 900, 400)
    out = hopping_window_agg(ev, "ts", ["event_type"], "value", 900, 300)
    plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "EvalPython" not in plan
    assert "Generate" in plan  # offset explode, not a window-table join
    assert plan.count("Exchange") == 1  # one partial-combined groupBy
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# interval_coalesce: gaps-and-islands merge
# ---------------------------------------------------------------------------


def test_interval_coalesce_hand_example(spark):
    from word_sense_disambiguation_spark.operators.temporal import (
        interval_coalesce,
    )

    rows = [
        # key a: [1,5] overlaps [3,8], [8,10] touches -> one island [1,10];
        # [2,4] contained; [12,13] disjoint
        ("a", 1, 5, 1), ("a", 3, 8, 2), ("a", 8, 10, 3), ("a", 2, 4, 4),
        ("a", 12, 13, 5),
        # key b: single interval
        ("b", 0, 1, 6),
        # key c: exact duplicate intervals merge into one island of 2
        ("c", 5, 6, 7), ("c", 5, 6, 8),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long, id long")
    got = sorted(
        (r.k, r.start, r["end"], r.n_intervals)
        for r in interval_coalesce(
            df, ["k"], "s", "e", tiebreak_cols=["id"]
        ).collect()
    )
    assert got == [
        ("a", 1, 10, 4),
        ("a", 12, 13, 1),
        ("b", 0, 1, 1),
        ("c", 5, 6, 2),
    ]


def test_interval_coalesce_invariance_and_plan(spark):
    import random as _r

    from word_sense_disambiguation_spark.operators.temporal import (
        interval_coalesce,
    )

    _r.seed(5)
    rows = []
    for i in range(300):
        s = _r.randrange(50)
        rows.append(("k%d" % _r.randrange(3), s, s + _r.randrange(1, 6), i))
    df = spark.createDataFrame(rows, "k string, s long, e long, id long")
    a = interval_coalesce(df.coalesce(1), ["k"], "s", "e", ["id"]).collect()
    b = interval_coalesce(df.repartition(9), ["k"], "s", "e", ["id"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # islands are disjoint and ordered per key
    per = {}
    for r in a:
        per.setdefault(r.k, []).append((r.start, r["end"]))
    for ivs in per.values():
        ivs.sort()
        for (s1, e1), (s2, _e2) in zip(ivs, ivs[1:]):
            assert s2 > e1
    plan = (
        interval_coalesce(df.repartition(9), ["k"], "s", "e", ["id"])
        ._jdf.queryExecution()  # noqa: SLF001
        .executedPlan()
        .toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# funnel_counts: ordered conversion funnel
# ---------------------------------------------------------------------------


def test_funnel_counts_strict_order_and_ties(spark):
    from word_sense_disambiguation_spark.operators.temporal import (
        funnel_counts,
    )

    rows = [
        # u1 completes A -> B -> C in order
        (1, T(2024, 1, 1, 0, 0, 1), 1, "A"),
        (1, T(2024, 1, 1, 0, 0, 2), 2, "B"),
        (1, T(2024, 1, 1, 0, 0, 3), 3, "C"),
        # u2: B BEFORE its A -> only step A counts
        (2, T(2024, 1, 1, 0, 0, 5), 4, "B"),
        (2, T(2024, 1, 1, 0, 0, 6), 5, "A"),
        # u3: A and B at the SAME ts — event_id tiebreak orders A(7) < B(8),
        # so B counts as after A; C at same ts as B but smaller id -> no C
        (3, T(2024, 1, 1, 0, 1, 0), 7, "A"),
        (3, T(2024, 1, 1, 0, 1, 0), 8, "B"),
        (3, T(2024, 1, 1, 0, 1, 0), 6, "C"),
        # u4 never does A
        (4, T(2024, 1, 1, 0, 2, 0), 9, "B"),
    ]
    df = spark.createDataFrame(
        rows, "user long, ts timestamp, eid long, etype string"
    )
    got = {
        r.step: r.n_users
        for r in funnel_counts(
            df, "user", "ts", "etype", ["A", "B", "C"], "eid"
        ).collect()
    }
    assert got == {"A": 3, "B": 2, "C": 1}


def test_funnel_counts_parallelism_invariance(spark):
    import random as _r

    from word_sense_disambiguation_spark.operators.temporal import (
        funnel_counts,
    )

    _r.seed(9)
    rows = [
        (
            _r.randrange(12),
            T(2024, 1, 1, 0, 0, _r.randrange(50)),
            i,
            _r.choice(["A", "B", "C"]),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "user long, ts timestamp, eid long, etype string"
    )
    a = funnel_counts(
        df.coalesce(1), "user", "ts", "etype", ["A", "B", "C"], "eid"
    ).collect()
    b = funnel_counts(
        df.repartition(7), "user", "ts", "etype", ["A", "B", "C"], "eid"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # funnel is monotone non-increasing
    ns = [r.n_users for r in sorted(a, key=lambda r: r.step_index)]
    assert ns == sorted(ns, reverse=True)


# ---------------------------------------------------------------------------
# interval_overlap_join: interval x interval overlap as bucketized equi-join
# ---------------------------------------------------------------------------


def test_interval_overlap_join_hand_example(spark):
    from word_sense_disambiguation_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [
            ("k", 1, 0.0, 10.0),   # wide: overlaps r1, r2, touches r3
            ("k", 2, 11.0, 12.0),  # disjoint from r1/r2, inside r3's tail
            ("k", 3, 50.0, 40.0),  # degenerate lo > hi: matches nothing
            ("q", 4, 0.0, 10.0),   # other key: isolated
        ],
        "k string, la long, a_lo double, a_hi double",
    )
    right = spark.createDataFrame(
        [
            ("k", 1, 2.0, 3.0),     # contained in l1
            ("k", 2, 9.0, 15.0),    # overlaps l1 and l2
            ("k", 3, 10.0, 11.0),   # touches l1 at 10 and l2 at 11 (closed)
            ("k", 4, 20.0, 21.0),   # disjoint from all
        ],
        "k string, rb long, b_lo double, b_hi double",
    )
    pairs, oversized = interval_overlap_join(
        left, right, "a_lo", "a_hi", "b_lo", "b_hi",
        keys=["k"], bucket_width=4.0, max_buckets=64,
    )
    got = sorted((r.k, r.la, r.rb) for r in pairs.collect())
    assert got == [("k", 1, 1), ("k", 1, 2), ("k", 1, 3),
                   ("k", 2, 2), ("k", 2, 3)]
    assert oversized.count() == 0


def test_interval_overlap_join_matches_bruteforce_exactly_once(spark):
    import random as _r

    from word_sense_disambiguation_spark.operators.temporal import (
        interval_overlap_join,
    )

    _r.seed(21)
    L = [("k%d" % _r.randrange(2), i, float(_r.randrange(100)),)
         for i in range(120)]
    L = [(k, i, lo, lo + _r.randrange(0, 12)) for (k, i, lo) in L]
    R = [("k%d" % _r.randrange(2), i, float(_r.randrange(100)),)
         for i in range(120)]
    R = [(k, i, lo, lo + _r.randrange(0, 12)) for (k, i, lo) in R]
    want = sorted(
        (lk, li, ri)
        for (lk, li, llo, lhi) in L
        for (rk, ri, rlo, rhi) in R
        if lk == rk and llo <= rhi and rlo <= lhi
    )
    ldf = spark.createDataFrame(L, "k string, la long, a_lo double, a_hi double")
    rdf = spark.createDataFrame(R, "k string, rb long, b_lo double, b_hi double")
    pairs, oversized = interval_overlap_join(
        ldf, rdf, "a_lo", "a_hi", "b_lo", "b_hi",
        keys=["k"], bucket_width=4.0, max_buckets=64,
    )
    got = sorted((r.k, r.la, r.rb) for r in pairs.collect())
    assert got == want  # exactly-once: sorted WITH duplicates must equal
    assert oversized.count() == 0


def test_interval_overlap_join_oversized_side_table(spark):
    from word_sense_disambiguation_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [("k", 1, 0.0, 1000.0), ("k", 2, 0.0, 2.0)],
        "k string, la long, a_lo double, a_hi double",
    )
    right = spark.createDataFrame(
        [("k", 9, 1.0, 2.0)], "k string, rb long, b_lo double, b_hi double"
    )
    pairs, oversized = interval_overlap_join(
        left, right, "a_lo", "a_hi", "b_lo", "b_hi",
        keys=["k"], bucket_width=4.0, max_buckets=8,
    )
    # the giant interval is excluded and reported, never silently paired
    assert [(r.la, r.rb) for r in pairs.collect()] == [(2, 9)]
    ov = oversized.collect()
    assert len(ov) == 1 and ov[0].side == "left" and ov[0].hi == 1000.0


def test_transition_model_exact_probabilities(spark):
    """Counts, totals, and scaled-DIV probabilities are exact integers;
    per-src p_scaled sums to <= scale with deficit < n_dst."""
    from word_sense_disambiguation_spark.operators.temporal import (
        transition_model,
    )

    edges = spark.createDataFrame(
        [("a", "b")] * 2 + [("a", "c")] * 1 + [("b", "a")] * 3
        + [(None, "x"), ("x", None)],
        "src string, dst string",
    )
    out = {(r.src, r.dst): r for r in transition_model(edges, scale=1000).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "a")}
    assert out[("a", "b")].n_transitions == 2
    assert out[("a", "b")].out_total == 3
    assert out[("a", "b")].p_scaled == 666      # (2*1000) DIV 3
    assert out[("a", "c")].p_scaled == 333
    assert out[("b", "a")].p_scaled == 1000
    assert 666 + 333 <= 1000  # floor deficit < n_dst


def test_transition_model_partitioning_invariant(spark):
    from word_sense_disambiguation_spark.operators.temporal import (
        transition_model,
    )

    rows = [(f"s{i % 7}", f"d{(i * 3) % 11}") for i in range(500)]
    df = spark.createDataFrame(rows, "src string, dst string")
    a = transition_model(df.coalesce(1)).collect()
    b = transition_model(df.repartition(13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_retention_cohorts_semantics(spark):
    """Cohort = first active period; a user active twice in one period
    counts once; later cohorts are independent."""
    import datetime as dt

    from word_sense_disambiguation_spark.operators.temporal import (
        retention_cohorts,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base), (1, base + dt.timedelta(days=1)),
        (2, base), (2, base + dt.timedelta(days=2)),
        (2, base + dt.timedelta(days=2, hours=3)),   # dup within period
        (3, base + dt.timedelta(days=1)),            # later cohort
        (None, base), (4, None),                     # dropped
    ]
    ev = spark.createDataFrame(rows, "u long, ts timestamp")
    out = {
        (r.cohort_period, r.periods_since): r.n_users
        for r in retention_cohorts(ev, "u", "ts", period_s=86400).collect()
    }
    d0 = base.replace(tzinfo=dt.timezone.utc).timestamp() // 86400
    assert out == {
        (d0, 0): 2, (d0, 1): 1, (d0, 2): 1,   # cohort of day 0: u1, u2
        (d0 + 1, 0): 1,                        # cohort of day 1: u3
    }


def test_retention_cohorts_parallelism_invariant(spark):
    import datetime as dt

    from word_sense_disambiguation_spark.operators.temporal import (
        retention_cohorts,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i % 17, base + dt.timedelta(hours=(i * 7) % 600))
        for i in range(500)
    ]
    ev = spark.createDataFrame(rows, "u long, ts timestamp")
    a = retention_cohorts(ev.coalesce(1), "u", "ts", 86400).collect()
    b = retention_cohorts(ev.repartition(13), "u", "ts", 86400).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_session_window_stats_gap_boundary_pinned(spark):
    """Exactly-gap-apart events MERGE (strict-> rule, same as the
    sessionization oracle); one microsecond past the gap splits."""
    import datetime as dt

    from word_sense_disambiguation_spark.operators.temporal import (
        session_window_stats,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, base), (2, 1, base + dt.timedelta(seconds=1800)),
        (3, 2, base), (4, 2, base + dt.timedelta(seconds=1800, microseconds=1)),
        (5, None, base), (6, 3, None),
    ]
    ev = spark.createDataFrame(rows, "event_id long, u long, ts timestamp")
    out = session_window_stats(ev, "u", "ts", "event_id")
    got = {(r.u, r.session_start_s, r.n_events, r.first_event_id,
            r.last_event_id, r.session_end_s)
           for r in out.collect()}
    s0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == {
        (1, s0, 2, 1, 2, s0 + 3600),          # merged, end = last + gap
        (2, s0, 1, 3, 3, s0 + 1800),
        (2, s0 + 1800, 1, 4, 4, s0 + 3600),   # floored micro boundary
    }
