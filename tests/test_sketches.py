"""hll_distinct: python-replay exactness, duplicate-blindness,
accuracy, invariance, and parameter validation."""

from __future__ import annotations

import hashlib

import pytest

from word_sense_disambiguation_spark.operators.sketches import hll_distinct


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
