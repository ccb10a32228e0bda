"""Sorted-neighborhood blocking + golden-record fusion: brute-force
identities, pinned tie-breaks, and plan-shape guards for the two-level
rank construction."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from word_sense_disambiguation_spark.operators.blocking import (
    sorted_neighborhood_pairs,
)
from word_sense_disambiguation_spark.operators.fusion import golden_record


def _brute_pairs(rows, window):
    srt = sorted((k, i) for i, k in rows if k is not None)
    return {
        (srt[i][1], srt[j][1], j - i)
        for i in range(len(srt))
        for j in range(i + 1, min(i + window, len(srt)))
    }


SNB_ROWS = [
    (1, "alpha"), (2, "alpine"), (3, "beta"), (4, "beta"), (5, "bison"),
    (6, None), (7, "aa"), (8, "ab"), (9, "ba"), (10, "bb"), (11, "zz"),
    (12, "a"),
]


@pytest.mark.parametrize("window,bucket_len", [(2, 1), (3, 1), (4, 2), (5, 4), (12, 1)])
def test_snb_equals_brute_force(spark, window, bucket_len):
    """Two-level rank + chunk join == the textbook global-sort definition,
    across window sizes, bucket granularities, duplicate keys (ties broken
    by id), bucket-boundary-straddling neighbors, and a NULL key (never
    pairs). window > n degrades to all-pairs, not an error."""
    df = spark.createDataFrame(SNB_ROWS, "id long, k string")
    got = {
        (r.id_a, r.id_b, r.rank_gap)
        for r in sorted_neighborhood_pairs(
            df, "id", "k", window=window, bucket_len=bucket_len
        ).collect()
    }
    assert got == _brute_pairs(SNB_ROWS, window)


def test_snb_pair_count_is_linear(spark):
    """n rows emit exactly sum over gaps = n*(w-1) - (w-1)w/2 pairs — the
    linear-output contract (never B(B-1)/2 of a naive key block)."""
    n, w = 500, 5
    df = spark.range(n).select(
        F.col("id"), F.format_string("k%05d", F.col("id")).alias("k")
    )
    cnt = sorted_neighborhood_pairs(df, "id", "k", window=w, bucket_len=3).count()
    g = w - 1
    assert cnt == n * g - g * (g + 1) // 2


def test_snb_plan_has_no_global_row_window_and_no_cartesian(spark):
    """The ONLY unpartitioned window runs over the per-bucket COUNT table
    (one row per bucket), never over row data: every windowspecdefinition
    in the optimized plan that lacks a partition column must consume the
    aggregated count, and the pair join must be an equi-join (no
    CartesianProduct / BroadcastNestedLoop)."""
    df = spark.range(2000).select(
        F.col("id"), F.format_string("k%05d", F.col("id")).alias("k")
    )
    pairs = sorted_neighborhood_pairs(df, "id", "k", window=4, bucket_len=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # the row-data window is partitioned by the bucket column _b
    assert "partitionBy=[_b]" in plan.replace(" ", "") or "_b" in plan
    # level-1 (running offsets) consumes the aggregate, so a HashAggregate
    # must appear below the unpartitioned window in the plan tree
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_snb_rejects_degenerate_window():
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(None, "id", "k", window=1)


GR_ROWS = [
    # cluster 1: mode tie between "en" and "fr" (1 each) -> smallest wins;
    # argmax length tie between ids 11 and 12 -> largest id wins
    (11, 1, "en", "s1", 40),
    (12, 1, "fr", "s2", 40),
    # cluster 2: clear mode, distinct lengths
    (21, 2, "de", "s1", 10),
    (22, 2, "de", "s1", 30),
    (23, 2, "es", "s3", 20),
]


def test_golden_record_rules_and_tiebreaks(spark):
    df = spark.createDataFrame(
        GR_ROWS, "doc_id long, cluster_id long, lang string, source string, n_chars long"
    )
    out = {
        r.cluster_id: r
        for r in golden_record(
            df,
            "cluster_id",
            {
                "n_members": ("count",),
                "rep_doc": ("min", "doc_id"),
                "longest_doc": ("argmax", "doc_id", "n_chars"),
                "shortest_doc": ("argmin", "doc_id", "n_chars"),
                "total_chars": ("sum", "n_chars"),
                "lang_mode": ("mode", "lang"),
                "source_mode": ("mode", "source"),
            },
        ).collect()
    }
    c1, c2 = out[1], out[2]
    assert (c1.n_members, c1.rep_doc, c1.total_chars) == (2, 11, 80)
    assert c1.longest_doc == 12  # equal n_chars -> largest value wins
    assert c1.shortest_doc == 11  # equal n_chars -> smallest value wins
    assert c1.lang_mode == "en"  # 1-1 tie -> smallest value
    assert (c2.n_members, c2.rep_doc, c2.total_chars) == (3, 21, 60)
    assert c2.longest_doc == 22 and c2.shortest_doc == 21
    assert c2.lang_mode == "de" and c2.source_mode == "s1"


def test_golden_record_is_aggregate_not_window(spark):
    """Every survivorship rule must compile to aggregates with map-side
    partial combine (two-phase *Aggregate pairs), never a per-cluster sort
    window — the assign_senses scale invariant: a hot crawl cluster ships
    one buffer per map partition, not every member row."""
    df = spark.createDataFrame(
        GR_ROWS, "doc_id long, cluster_id long, lang string, source string, n_chars long"
    )
    out = golden_record(
        df,
        "cluster_id",
        {
            "n_members": ("count",),
            "longest_doc": ("argmax", "doc_id", "n_chars"),
            "lang_mode": ("mode", "lang"),
        },
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_" in plan  # map-side combine present


def test_golden_record_rejects_unknown_rule(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, cluster_id long")
    with pytest.raises(ValueError):
        golden_record(df, "cluster_id", {"x": ("median", "doc_id")})
    with pytest.raises(ValueError):
        golden_record(df, "cluster_id", {})
