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


# ---------------------------------------------------------------------------
# checksum_diff: merkle-style two-snapshot bucket diff
# ---------------------------------------------------------------------------


def test_checksum_diff_all_statuses(spark):
    from word_sense_disambiguation_spark.operators.profiling import (
        checksum_diff,
    )

    left = spark.createDataFrame(
        [(i, "v%d" % i) for i in range(40)], "id long, v string"
    )
    # perturb: modify id 3, delete id 5, insert id 1000
    right = spark.createDataFrame(
        [(i, "v%d" % i) for i in range(40) if i != 5 and i != 3]
        + [(3, "CHANGED"), (1000, "new")],
        "id long, v string",
    )
    out = checksum_diff(left, right, ["id"], ["v"], n_buckets=8).collect()
    by_status = {}
    for r in out:
        by_status.setdefault(r.status, []).append(r)
    # every bucket accounted for, statuses consistent with the counts
    assert sum(len(v) for v in by_status.values()) == len(out) <= 8
    assert len(by_status.get("mismatch", [])) >= 1
    for r in by_status.get("equal", []):
        assert r.left_n == r.right_n and r.left_checksum == r.right_checksum
    for r in by_status.get("mismatch", []):
        assert (r.left_n != r.right_n) or (r.left_checksum != r.right_checksum)
    # identical tables -> every bucket equal
    same = checksum_diff(left, left, ["id"], ["v"], n_buckets=8).collect()
    assert all(r.status == "equal" for r in same)
    # totals reconcile
    assert sum(r.left_n or 0 for r in out) == 40
    assert sum(r.right_n or 0 for r in out) == 40


def test_checksum_diff_order_and_partitioning_invariant(spark):
    from word_sense_disambiguation_spark.operators.profiling import (
        checksum_diff,
    )

    left = spark.createDataFrame(
        [(i, "x" * (i % 5)) for i in range(200)], "id long, v string"
    )
    right = left.filter("id % 31 != 0")
    a = checksum_diff(
        left.coalesce(1), right.coalesce(1), ["id"], ["v"], n_buckets=16
    ).collect()
    b = checksum_diff(
        left.repartition(13),
        right.orderBy(F.desc("id")).repartition(5),
        ["id"],
        ["v"],
        n_buckets=16,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_checksum_diff_detects_within_bucket_content_swap(spark):
    """Two keys in the same bucket swapping contents must NOT cancel:
    keys ride inside the row hash."""
    from word_sense_disambiguation_spark.operators.profiling import (
        checksum_diff,
    )

    left = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    swapped = spark.createDataFrame(
        [(1, "b"), (2, "a")], "id long, v string"
    )
    out = checksum_diff(left, swapped, ["id"], ["v"], n_buckets=1).collect()
    assert len(out) == 1 and out[0].status == "mismatch"
    assert out[0].left_n == out[0].right_n == 2


def test_referential_integrity_audit_counts(spark):
    """Orphan semantics: NULL FK is reported separately, never an
    orphan; n_orphan counts child ROWS, n_orphan_keys distinct keys;
    duplicate parent keys don't double-count children."""
    from word_sense_disambiguation_spark.operators.profiling import (
        referential_integrity_audit,
    )

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (3,), (3,), (None,), (None,)],
        "fk long",
    )
    parent = spark.createDataFrame([(1,), (1,), (9,)], "pk long")
    out = referential_integrity_audit(
        [("c->p", child, "fk", parent, "pk")]
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.relation == "c->p"
    assert r.n_child == 6          # non-null FK rows
    assert r.n_null_fk == 2
    assert r.n_orphan == 4         # rows with fk in {2, 3}
    assert r.n_orphan_keys == 2    # keys {2, 3}


def test_referential_integrity_audit_clean_and_empty(spark):
    from word_sense_disambiguation_spark.operators.profiling import (
        referential_integrity_audit,
    )

    child = spark.createDataFrame([(1,), (2,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    empty = spark.createDataFrame([], "fk long")
    out = {
        r.relation: r
        for r in referential_integrity_audit(
            [
                ("clean", child, "fk", parent, "pk"),
                ("empty_child", empty, "fk", parent, "pk"),
                ("empty_parent", child, "fk",
                 spark.createDataFrame([], "pk long"), "pk"),
            ]
        ).collect()
    }
    assert out["clean"].n_orphan == 0 and out["clean"].n_child == 2
    assert out["empty_child"].n_child == 0
    assert out["empty_child"].n_orphan == 0
    assert out["empty_parent"].n_orphan == 2
    assert out["empty_parent"].n_orphan_keys == 2


def test_distribution_drift_exact_tv(spark):
    """Hand arithmetic at scale=1000: p=(750,250) vs q=(250,750) ->
    TV = 500/1000; identical distributions -> 0; empty side -> NULL."""
    from word_sense_disambiguation_spark.operators.profiling import (
        distribution_drift,
    )

    l = spark.createDataFrame([("a",)] * 3 + [("b",)], "c string")
    r = spark.createDataFrame([("a",)] + [("b",)] * 3, "c string")
    out = distribution_drift(l, r, "c", scale=1000).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.n_left, row.n_right, row.n_categories) == (4, 4, 2)
    assert row.tv_scaled == 500
    same = distribution_drift(l, l, "c", scale=1000).collect()[0]
    assert same.tv_scaled == 0
    empty = spark.createDataFrame([], "c string")
    assert distribution_drift(l, empty, "c", scale=1000).collect()[0].tv_scaled is None


def test_distribution_drift_disjoint_categories_and_slices(spark):
    """Fully disjoint alphabets -> TV = scale (max drift, up to floor
    truncation); slices are independent."""
    from word_sense_disambiguation_spark.operators.profiling import (
        distribution_drift,
    )

    l = spark.createDataFrame([("s1", "a"), ("s1", "a"), ("s2", "x")],
                              "s string, c string")
    r = spark.createDataFrame([("s1", "b"), ("s2", "x")],
                              "s string, c string")
    out = {r_.s: r_ for r_ in
           distribution_drift(l, r, "c", ["s"], scale=1000).collect()}
    assert out["s1"].tv_scaled == 1000     # disjoint: (1000-0)+(0-1000) over 2
    assert out["s2"].tv_scaled == 0
    assert out["s1"].n_categories == 2


def test_deletion_impact_cascade(spark):
    """Chain semantics: stage-2 keys come from AFFECTED stage-1 rows
    only; NULL FKs never match; counts are rows, keys are distinct."""
    from word_sense_disambiguation_spark.operators.profiling import (
        deletion_impact,
    )

    seeds = spark.createDataFrame([(1,), (2,)], "uid long")
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 3), (13, 2), (14, None)],
        "okey long, cust long",
    )
    items = spark.createDataFrame(
        [(10,), (10,), (11,), (12,), (None,)], "okey long"
    )
    out = {
        (r.table_name, r.step): (r.n_rows_affected, r.n_matched_keys)
        for r in deletion_impact(
            seeds, "uid",
            [("orders", orders, "cust", "okey"),
             ("items", items, "okey", None)],
        ).collect()
    }
    # orders: rows 10, 11 (cust 1), 13 (cust 2) -> 3 rows, 2 keys
    # items: keys {10, 11, 13} -> rows 10, 10, 11 -> 3 rows, 2 keys
    assert out == {("orders", 1): (3, 2), ("items", 2): (3, 2)}


def test_deletion_impact_empty_seed_and_no_match(spark):
    from word_sense_disambiguation_spark.operators.profiling import (
        deletion_impact,
    )

    seeds = spark.createDataFrame([], "uid long")
    child = spark.createDataFrame([(1,), (2,)], "fk long")
    out = deletion_impact(
        seeds, "uid", [("c", child, "fk", None)]
    ).collect()
    assert [tuple(r) for r in out] == [("c", 1, 0, 0)]
