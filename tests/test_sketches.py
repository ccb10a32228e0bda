"""hll_distinct: python-replay exactness, duplicate-blindness,
accuracy, invariance, and parameter validation. Count-Min: python-replay
exactness, one-sided error, additivity under union, heavy-hitter
superset guarantee, and plan shape."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from word_sense_disambiguation_spark.operators.sketches import (
    cms_estimate,
    cms_heavy_hitters,
    cms_sketch,
    hll_distinct,
)


def _py_hll(rows, m=64):
    regs: dict = {}
    for k, v in rows:
        if v is None:
            continue
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        b, w = h % m, h >> (m.bit_length() - 1)
        rank = 55 if w == 0 else 55 - w.bit_length()
        regs[(k, b)] = max(regs.get((k, b), 0), rank)
    out = {}
    for k in {k for k, _ in rows}:
        M = [r for (kk, _b), r in regs.items() if kk == k]
        denom = sum(1 << (55 - r) for r in M) + (m - len(M)) * (1 << 55)
        est = (0.709 * m * m * float(1 << 55)) / float(denom)
        out[k] = (m - len(M), denom, est)
    return out


def test_hll_matches_python_replay_bit_for_bit(spark):
    rows = [
        ("g%d" % (i % 3), "val-%d" % (i % (500 + 100 * (i % 3))))
        for i in range(20000)
    ] + [("g0", None)]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {r["k"]: r for r in hll_distinct(df, ["k"], "v").collect()}
    want = _py_hll(rows)
    for k, (nz, denom, est) in want.items():
        assert got[k]["n_zero_registers"] == nz
        assert got[k]["denom_scaled"] == denom
        assert got[k]["estimate"] == est  # exact, not approx


def test_hll_accuracy_and_duplicate_blindness(spark):
    rows = [("k", "item-%d" % (i % 1000)) for i in range(50000)]
    df = spark.createDataFrame(rows, "k string, v string")
    est = hll_distinct(df, ["k"], "v").collect()[0]["estimate"]
    assert abs(est - 1000) / 1000 < 0.35  # 1.04/sqrt(64) ~= 13% std error
    # a sketch of df UNION df must be IDENTICAL (registers are maxes)
    dup = hll_distinct(df.union(df), ["k"], "v").collect()[0]
    one = hll_distinct(df, ["k"], "v").collect()[0]
    assert tuple(dup) == tuple(one)


def test_hll_parallelism_invariant(spark):
    rows = [("g%d" % (i % 2), i * 17) for i in range(5000)]
    df = spark.createDataFrame(rows, "k string, v long")
    a = sorted(map(tuple, hll_distinct(df.repartition(11), ["k"], "v").collect()))
    b = sorted(map(tuple, hll_distinct(df.coalesce(1), ["k"], "v").collect()))
    assert a == b


def test_hll_rejects_bad_m(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError):
        hll_distinct(df, ["k"], "v", m=48)
    with pytest.raises(ValueError):
        hll_distinct(df, ["k"], "v", m=0)


# --- Count-Min ----------------------------------------------------------


def _cms_bucket(i: int, item, w: int) -> int:
    return int(hashlib.md5(f"{i}:{item}".encode()).hexdigest()[:15], 16) % w


def _py_cms(items, d, w):
    sk: Counter = Counter()
    for x in items:
        if x is None:
            continue
        for i in range(d):
            sk[(i, _cms_bucket(i, x, w))] += 1
    return sk


_ITEMS = [f"item-{i % 37}" for i in range(2000)] + ["hot"] * 500 + [None] * 3


def test_cms_sketch_matches_python_replay_bit_for_bit(spark):
    d, w = 4, 64
    df = spark.createDataFrame([(x,) for x in _ITEMS], "item string")
    got = {
        (r["cms_row"], r["cms_bucket"]): r["cms_count"]
        for r in cms_sketch(df, "item", d=d, w=w).collect()
    }
    assert got == dict(_py_cms(_ITEMS, d, w))


def test_cms_estimate_one_sided_and_exact_without_collisions(spark):
    df = spark.createDataFrame([(x,) for x in _ITEMS], "item string")
    true = Counter(x for x in _ITEMS if x is not None)
    # tight table: estimates may only ever OVERcount
    est_small = {
        r["item"]: r["est_count"]
        for r in cms_estimate(
            cms_sketch(df, "item", d=2, w=16), df, "item", d=2, w=16
        ).collect()
    }
    assert set(est_small) == set(true)
    assert all(est_small[x] >= n for x, n in true.items())
    # wide table (38 distinct items, 4 x 4096 counters): exact
    est_wide = {
        r["item"]: r["est_count"]
        for r in cms_estimate(
            cms_sketch(df, "item", d=4, w=4096), df, "item", d=4, w=4096
        ).collect()
    }
    assert est_wide == dict(true)
    # an item the sketch never saw estimates as... >= 0 and, in the
    # wide table, exactly 0 (no collisions with real mass)
    unseen = spark.createDataFrame([("never-seen",)], "item string")
    z = cms_estimate(
        cms_sketch(df, "item", d=4, w=4096), unseen, "item", d=4, w=4096
    ).collect()
    assert z[0]["est_count"] == 0


def test_cms_sketches_add_under_union(spark):
    d, w = 4, 64
    a = spark.createDataFrame([(x,) for x in _ITEMS[:1000]], "item string")
    b = spark.createDataFrame([(x,) for x in _ITEMS[1000:]], "item string")
    both = {
        (r["cms_row"], r["cms_bucket"]): r["cms_count"]
        for r in cms_sketch(a.union(b), "item", d=d, w=w).collect()
    }
    sa = Counter(
        {
            (r["cms_row"], r["cms_bucket"]): r["cms_count"]
            for r in cms_sketch(a, "item", d=d, w=w).collect()
        }
    )
    sa.update(
        {
            (r["cms_row"], r["cms_bucket"]): r["cms_count"]
            for r in cms_sketch(b, "item", d=d, w=w).collect()
        }
    )
    assert both == dict(sa)


def test_cms_heavy_hitters_superset_and_plan(spark):
    df = spark.createDataFrame([(x,) for x in _ITEMS], "item string")
    true = Counter(x for x in _ITEMS if x is not None)
    hh = cms_heavy_hitters(df, "item", threshold=100, d=2, w=16)
    got = {r["item"] for r in hh.collect()}
    assert {x for x, n in true.items() if n >= 100} <= got  # never misses
    plan = hh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the <=d*w sketch is broadcast
    assert "Window" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
