"""group_quantiles: python order-statistic oracle, integer-rank
arithmetic (the ceil(p*n) float trap), edge groups, nulls, coincident
ranks, parameter validation, and plan shape (partial-combined counts +
broadcast join, exactly one sort window)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from word_sense_disambiguation_spark.operators.quantiles import (
    DEFAULT_QUANTILES,
    group_quantiles,
)


def _py_quantiles(rows, quantiles=DEFAULT_QUANTILES):
    by_key: dict = {}
    for k, v in rows:
        if v is not None:
            by_key.setdefault(k, []).append(v)
    out = set()
    for k, vals in by_key.items():
        vals.sort()
        n = len(vals)
        for label, num, den in quantiles:
            kr = max(1, -(-(num * n) // den))  # ceil in pure ints
            out.add((k, label, kr, vals[kr - 1]))
    return out


def test_quantiles_match_python_order_stats(spark):
    rows = [("g%d" % (i % 4), (i * 37) % 211) for i in range(3000)]
    rows += [("g0", None), ("solo", 42)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r["k"], r["quantile"], r["q_rank"], r["q_value"])
        for r in group_quantiles(df, ["k"], "v").collect()
    }
    assert got == _py_quantiles(rows)
    # the size-1 group: every quantile is the single element at rank 1
    assert ("solo", "p50", 1, 42) in got and ("solo", "p99", 1, 42) in got


def test_quantiles_integer_rank_avoids_float_ceil_trap(spark):
    # p=14/100 at n=100: the true rank is ceil(14) = 14, but the IEEE
    # double product is 14.000000000000002 so a float ceil gives 15 —
    # the divergence the pure-integer rank arithmetic exists to avoid
    assert math.ceil(0.14 * 100) == 15  # the trap is real
    df = spark.createDataFrame(
        [("k", i) for i in range(1, 101)], "k string, v int"
    )
    got = {r["quantile"]: (r["q_rank"], r["q_value"]) for r in
           group_quantiles(df, ["k"], "v",
                           quantiles=(("p14", 14, 100), ("p50", 1, 2))).collect()}
    assert got["p14"] == (14, 14)
    assert got["p50"] == (50, 50)


def test_quantiles_coincident_ranks_emit_one_row_each(spark):
    # n=2: p90 and p99 both land on rank 2 — each still emits its row
    df = spark.createDataFrame([("k", 1), ("k", 7)], "k string, v int")
    rows = group_quantiles(df, ["k"], "v").collect()
    assert len(rows) == 3
    assert {(r["quantile"], r["q_rank"], r["q_value"]) for r in rows} == {
        ("p50", 1, 1),
        ("p90", 2, 7),
        ("p99", 2, 7),
    }


def test_quantiles_rejects_bad_rational(spark):
    df = spark.createDataFrame([("k", 1)], "k string, v int")
    with pytest.raises(ValueError):
        group_quantiles(df, ["k"], "v", quantiles=(("bad", 3, 2),))
    with pytest.raises(ValueError):
        group_quantiles(df, ["k"], "v", quantiles=(("zero", 0, 2),))


def test_quantiles_plan_shape(spark):
    df = spark.createDataFrame(
        [("g%d" % (i % 3), i) for i in range(100)], "k string, v int"
    )
    q = group_quantiles(df, ["k"], "v")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # group sizes from a partial-combined aggregate, broadcast back —
    # never a count-over-full-partition window
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") == 1  # the one irreducible rank window
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_sampled_quantiles_deterministic_and_exact_on_sample(spark):
    """The sample is a pure function of the id (parallelism/order
    invariant) and the quantiles equal group_quantiles run on the
    explicitly-filtered sample."""
    from word_sense_disambiguation_spark.operators.quantiles import (
        group_quantiles,
        sampled_group_quantiles,
    )

    df = spark.range(0, 2000).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS g", "CAST((id * 37) % 1000 AS LONG) AS v"
    )
    s1 = sampled_group_quantiles(df, ["g"], "v", "id", rate_den=4)
    s2 = sampled_group_quantiles(
        df.repartition(11).orderBy(F.desc("v")), ["g"], "v", "id", rate_den=4
    )
    r1 = sorted(map(tuple, s1.collect()))
    assert r1 == sorted(map(tuple, s2.collect()))

    keep = F.expr(
        "pmod(CAST(conv(substr(md5(concat('qs:', CAST(id AS STRING))), 1, 15),"
        " 16, 10) AS BIGINT), 4) = 0"
    )
    exact_on_sample = group_quantiles(df.filter(keep), ["g"], "v")
    assert r1 == sorted(map(tuple, exact_on_sample.collect()))
    # ~1/4 of rows survive per group (binomial, loose bounds)
    n = df.filter(keep).count()
    assert 350 < n < 650


def test_rank_buckets_hand_example(spark):
    """9 values in one group -> exact tertiles: cuts at ranks ceil(3)=3
    and ceil(6)=6, i.e. values 3 and 6; ties at a cut stay low; NULL
    value -> NULL bucket; a second group buckets independently."""
    from word_sense_disambiguation_spark.operators.quantiles import rank_buckets
    import pyspark.sql.functions as F

    rows = [("en", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9]]
    rows += [("fr", 100), ("fr", 200), ("fr", 300), ("en", None)]
    df = spark.createDataFrame(rows, "lang string, score long")
    out = rank_buckets(
        df, ["lang"], "score", n_buckets=3, labels=("tail", "middle", "head")
    )
    got = {(r.lang, r.score): r.bucket for r in out.collect()}
    for v in (1, 2, 3):
        assert got[("en", v)] == "tail"
    for v in (4, 5, 6):
        assert got[("en", v)] == "middle"
    for v in (7, 8, 9):
        assert got[("en", v)] == "head"
    assert got[("en", None)] is None
    assert got[("fr", 100)] == "tail" and got[("fr", 300)] == "head"
    # ties at the cut go LOW: all-equal group -> everything in bucket 0
    tie = spark.createDataFrame([("x", 5)] * 7, "lang string, score long")
    tb = rank_buckets(tie, ["lang"], "score").select("bucket").distinct().collect()
    assert [r.bucket for r in tb] == ["b0"]


def test_rank_buckets_invariance_and_plan(spark):
    """Partitioning invariance; the ASSIGNMENT side is a broadcast join
    + codegen CASE (the only window lives in the tiny cut derivation)."""
    from word_sense_disambiguation_spark.operators.quantiles import rank_buckets
    import pyspark.sql.functions as F

    df = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("lang"),
        ((F.col("id") * 37) % 1000).alias("score"),
    )
    a = sorted(rank_buckets(df.coalesce(1), ["lang"], "score").collect())
    b = sorted(rank_buckets(df.repartition(7), ["lang"], "score").collect())
    assert a == b
    plan = (
        rank_buckets(df, ["lang"], "score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_mad_outliers_hand_example(spark):
    """Group en = {10,11,12,13,14, 1000}: median 12 (type-1 rank
    ceil(6/2)=3... values sorted 10,11,12,13,14,1000 -> rank 3 = 12),
    deviations {2,1,0,1,2,988} -> MAD rank 3 = 1; only 1000 exceeds
    3.5*MAD. Degenerate all-equal group: MAD 0, any deviation flags."""
    from word_sense_disambiguation_spark.operators.quantiles import mad_outliers

    rows = [("en", v) for v in [10, 11, 12, 13, 14, 1000]]
    rows += [("zz", 5), ("zz", 5), ("zz", 5), ("zz", 6), ("en", None)]
    df = spark.createDataFrame(rows, "lang string, n long")
    out = {(r.lang, r.n): r for r in mad_outliers(df, ["lang"], "n").collect()}
    en = [out[("en", v)] for v in (10, 11, 12, 13, 14, 1000)]
    assert en[0].group_median == 12 and en[0].group_mad == 1
    assert [r.is_outlier for r in en] == [False, False, False, False, False, True]
    assert out[("en", None)].is_outlier is None
    assert out[("zz", 5)].is_outlier is False
    assert out[("zz", 6)].group_mad == 0 and out[("zz", 6)].is_outlier is True


def test_mad_outliers_invariance(spark):
    from word_sense_disambiguation_spark.operators.quantiles import mad_outliers
    import pyspark.sql.functions as F

    df = spark.range(0, 3000).select(
        (F.col("id") % 4).cast("string").alias("lang"),
        ((F.col("id") * 17) % 500).alias("n"),
    )
    a = sorted(mad_outliers(df.coalesce(1), ["lang"], "n").collect())
    b = sorted(mad_outliers(df.repartition(9), ["lang"], "n").collect())
    assert a == b
