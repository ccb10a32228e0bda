"""Bloom-filter join pruning: superset guarantee, exact-output identity,
portable word replay, plan shape, and sizing guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from word_sense_disambiguation_spark.operators.bloom import (
    bloom_positions_py,
    bloom_prune,
    bloom_semijoin,
    build_bloom_words,
)

M = 1 << 12
K = 4


@pytest.fixture(scope="module")
def tables(spark):
    small = spark.range(0, 300).withColumnRenamed("id", "k")
    big = spark.range(0, 20000).selectExpr(
        "id", "CASE WHEN id % 97 = 0 THEN NULL ELSE id % 1000 END AS bk"
    )
    return big, small


def test_words_match_python_replay(spark, tables):
    """The packed words are bit-identical to the python reference — the
    portability pin for the md5 position hash (same discipline as the
    CMS/HLL sketches)."""
    _, small = tables
    words = build_bloom_words(small, "k", m_bits=M, k=K)
    assert len(words) == M // 64
    py = [0] * (M // 64)
    for key in range(300):
        for p in bloom_positions_py(key, M, K):
            py[p // 64] |= 1 << (p % 64)
    py = [w - (1 << 64) if w >= (1 << 63) else w for w in py]
    assert py == [int(w) for w in words]


def test_prune_is_superset_and_semijoin_is_exact(spark, tables):
    big, small = tables
    words = build_bloom_words(small, "k", m_bits=M, k=K)
    pruned = bloom_prune(big, "bk", words, m_bits=M, k=K)
    exact = big.join(small, big.bk == small.k, "left_semi")
    pc, ec, bc = pruned.count(), exact.count(), big.count()
    assert ec <= pc < bc  # superset of matches, strictly prunes
    sj = bloom_semijoin(big, small, "bk", "k", m_bits=M, k=K)
    assert sj.exceptAll(exact).count() == 0
    assert exact.exceptAll(sj).count() == 0


def test_null_keys_never_pass(spark, tables):
    big, small = tables
    words = build_bloom_words(small, "k", m_bits=M, k=K)
    got = bloom_prune(big, "bk", words, m_bits=M, k=K)
    assert got.filter(F.col("bk").isNull()).count() == 0


def test_parallelism_invariance(spark, tables):
    """local-partitioning must not change the words (the engine-wide
    local[1] == local[32] contract): bit_or is order-insensitive."""
    _, small = tables
    w1 = build_bloom_words(small.coalesce(1), "k", m_bits=M, k=K)
    w7 = build_bloom_words(small.repartition(7), "k", m_bits=M, k=K)
    assert w1 == w7


def test_plan_prune_below_join_no_python(spark, tables):
    """The bloom predicate is a codegen Filter on the big side BELOW the
    semi-join (prune before the exchange — the whole point); no python
    evaluation anywhere."""
    big, small = tables
    sj = bloom_semijoin(big, small, "bk", "k", m_bits=M, k=K)
    plan = sj._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "EvalPython" not in plan
    join_at = plan.find("Join")
    filt_at = plan.find("shiftright")
    assert join_at != -1 and filt_at != -1
    # executedPlan prints top-down: the filter appears after (=below) the join
    assert filt_at > join_at


def test_sizing_guards():
    with pytest.raises(ValueError):
        build_bloom_words(None, "k", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom_words(None, "k", m_bits=1 << 22)  # literal ceiling


def test_join_path_identical_to_literal_path(spark, tables):
    """The beyond-literal-ceiling broadcast-join prune must keep the
    EXACT same rows as the literal predicate on the same words, and its
    plan must stay exchange-free on the fact side (k broadcast joins)."""
    from word_sense_disambiguation_spark.operators.bloom import (
        bloom_prune_by_join,
        bloom_words_df,
    )

    big, small = tables
    words = build_bloom_words(small, "k", m_bits=M, k=K)
    lit = bloom_prune(big, "bk", words, m_bits=M, k=K)
    jn = bloom_prune_by_join(
        big, "bk", bloom_words_df(spark, words), m_bits=M, k=K
    )
    assert jn.exceptAll(lit).count() == 0
    assert lit.exceptAll(jn).count() == 0

    plan = jn._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "EvalPython" not in plan
    assert plan.count("BroadcastHashJoin") == K
    # the only exchanges are the broadcast ones — nothing shuffles the fact side
    import re

    assert not re.search(r"(?<!Broadcast)Exchange hashpartitioning", plan)
