"""Column profiling and anti-entropy checksums: null/distinct semantics,
NULL-vs-empty discrimination, order/partition invariance, mutation
detection, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from word_sense_disambiguation_spark.operators.profiling import (
    profile_columns,
    table_checksum,
)


def test_profile_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "x long, s string"
    )
    got = {r.column: r for r in profile_columns(df, ["x", "s"]).collect()}
    assert got["x"].n == 4 and got["x"].n_null == 1 and got["x"].n_distinct == 3
    assert (got["x"].min_repr, got["x"].max_repr) == ("1", "3")
    assert got["s"].n_null == 1 and got["s"].n_distinct == 2
    assert (got["s"].min_repr, got["s"].max_repr) == ("a", "b")


def test_profile_single_plan_no_union_rescans(spark):
    """The long-form output comes from ONE explode over the aggregate
    row — never a per-column union (which re-plans/re-scans the
    aggregate subtree once per column)."""
    df = spark.createDataFrame([(1, "a")], "x long, s string")
    p = profile_columns(df, ["x", "s"])
    plan = p._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Union" not in plan
    assert "Generate" in plan  # the explode
    assert "EvalPython" not in plan


def test_checksum_detects_any_mutation_and_ignores_order(spark):
    df = spark.createDataFrame(
        [(1, "a", "g1"), (2, "b", "g1"), (3, None, "g2")],
        "id long, v string, g string",
    )
    base = sorted(map(tuple, table_checksum(df, ["id", "v"], ["g"]).collect()))

    shuffled = df.orderBy(F.desc("id")).repartition(7)
    assert sorted(map(tuple, table_checksum(shuffled, ["id", "v"], ["g"]).collect())) == base

    mutated = df.withColumn(
        "v", F.when(F.col("id") == 2, F.lit("B")).otherwise(F.col("v"))
    )
    assert sorted(map(tuple, table_checksum(mutated, ["id", "v"], ["g"]).collect())) != base

    # NULL vs empty string must hash differently (tagged-field encoding)
    empt = df.withColumn(
        "v", F.when(F.col("id") == 3, F.lit("")).otherwise(F.col("v"))
    )
    assert sorted(map(tuple, table_checksum(empt, ["id", "v"], ["g"]).collect())) != base


def test_checksum_survives_row_count_beyond_bigint_sum(spark):
    """8+ rows of 60-bit hashes would overflow a BIGINT sum under ANSI;
    the DECIMAL(38,0) accumulator must not."""
    df = spark.range(0, 5000).selectExpr("id", "'k' AS g")
    out = table_checksum(df, ["id"], ["g"]).collect()
    assert len(out) == 1 and out[0].n == 5000
    assert 0 <= out[0].checksum < (1 << 62)
