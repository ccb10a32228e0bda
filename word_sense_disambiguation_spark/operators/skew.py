"""Skew handling: salted two-phase aggregation and salted hot-key joins.

The reference's analogue is length-bucketed batching (bounding worst-case
work per unit, ``wsd/masked_language_model.py:113-126``); at cluster scale
the equivalent problem is a hot key that lands an entire stop-word-sized
block on one reducer. Two standard remedies, both expressed as plain
DataFrame transforms so AQE can still re-plan around them:

* :func:`salted_group_count` — two-phase aggregate: group on
  ``(key, salt)`` first (spreads the hot key over ``buckets`` reducers,
  map-side combine does most of the work), then re-aggregate on ``key``.
* :func:`salt_explode_small` — replicate-small/salt-big equi-join: the big
  side gets a random-but-deterministic salt, the small side is exploded
  across all salt values; the join key becomes ``(key, salt)``.

Salts are content-derived (xxhash64 of stable ids), never ``rand()`` —
parallelism-invariant results, the engine-wide rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(
    df: DataFrame,
    key_cols: list[str],
    salt_col: str,
    buckets: int = 32,
    agg_exprs: dict[str, str] | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation: count + optional sums per key.

    ``salt_col`` is any stable high-cardinality column (an id); the salt is
    ``xxhash64(salt_col) % buckets``. Phase 1 reduces (key, salt) partials;
    phase 2 merges ``buckets`` rows per key — the hot key's reduce work is
    split ``buckets`` ways.
    """
    agg_exprs = agg_exprs or {}
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        F.count("*").alias("_n"),
        *[F.sum(c).alias(f"_s_{c}") for c in agg_exprs],
    )
    return phase1.groupBy(*key_cols).agg(
        F.sum("_n").alias("n"),
        *[F.sum(f"_s_{c}").alias(alias) for c, alias in agg_exprs.items()],
    )


def key_skew_report(
    df: DataFrame,
    slice_cols: list[str],
    key_col: str,
) -> DataFrame:
    """Shuffle-skew diagnostic: per slice, the exact Gini coefficient of
    the per-key row-count distribution plus the heaviest key — the
    pre-flight report a 100 TB pipeline runs on a join/group key BEFORE
    committing to a partitioning (a Gini near 1 says "salt this key or
    broadcast the other side"; the hot-key share says how many salts).

    Scale shape (the whole point of the operator): a naive exact Gini
    needs a GLOBAL rank over per-key counts — an unpartitioned window,
    i.e. one task streaming every distinct key (the banned pattern,
    CLAUDE.md site_quota rule). Instead this contracts twice before any
    window: ``rows -> (key, count)`` (map-side combined groupBy), then
    ``(key, count) -> (count_value, n_keys)`` — the counts-of-counts
    histogram. Per-key counts are Zipfian small integers, so the
    histogram has at most a few thousand distinct values even when the
    key table has 10^11 rows; the single per-slice window runs over THAT.

    Exact tied-rank Gini from the histogram (values ``v_k`` ascending
    with multiplicities ``m_k``, cumulative key count ``c_k``)::

        S1 = sum_k v_k * (c_k*(c_k+1) - c_{k-1}*(c_{k-1}-... )) / 2
           = sum_k v_k * (c_k + c_{k-1} + 1) * m_k / 2      # since c_k - c_{k-1} = m_k
        G  = (2*S1 - (n_keys + 1) * n_rows) / (n_keys * n_rows)

    Everything up to the final ``G`` is BIGINT-exact (``2*S1`` is kept
    pre-halved so no /2 truncation exists); ``gini`` itself is ONE IEEE
    division — the oracle float discipline. Output per slice:
    ``n_rows, n_keys, max_key, max_count, gini_num, gini_den, gini``.

    Reference parity: the reference bounds worst-case batch work by
    length bucketing (wsd/masked_language_model.py:113-126); this is the
    same bound-the-hot-unit discipline applied to shuffle keys.
    """
    from pyspark.sql import Window

    counts = df.groupBy(*slice_cols, key_col).agg(F.count("*").alias("_c"))
    hist = counts.groupBy(*slice_cols, "_c").agg(
        F.count("*").alias("_m"),
        F.max_by(F.col(key_col), F.col(key_col)).alias("_vk"),
    )
    w = Window.partitionBy(*slice_cols).orderBy("_c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # cumulative key count c_k over the tiny histogram; twoS1 = 2*S1
    # stays integral: v * (c_k + c_{k-1} + 1) * m with c_{k-1} = c_k - m.
    cum = hist.withColumn("_ck", F.sum("_m").over(w)).withColumn(
        "_two_s1_term",
        F.col("_c")
        * (F.lit(2) * F.col("_ck") - F.col("_m") + F.lit(1))
        * F.col("_m"),
    )
    out = cum.groupBy(*slice_cols).agg(
        F.sum(F.col("_c") * F.col("_m")).cast("long").alias("n_rows"),
        F.sum("_m").cast("long").alias("n_keys"),
        F.max_by(F.col("_vk"), F.struct(F.col("_c"), F.col("_vk"))).alias(
            "max_key"
        ),
        F.max("_c").cast("long").alias("max_count"),
        F.sum("_two_s1_term").cast("long").alias("_two_s1"),
    )
    return out.select(
        *slice_cols,
        "n_rows",
        "n_keys",
        "max_key",
        "max_count",
        (
            F.col("_two_s1") - (F.col("n_keys") + F.lit(1)) * F.col("n_rows")
        ).cast("long").alias("gini_num"),
        (F.col("n_keys") * F.col("n_rows")).cast("long").alias("gini_den"),
        (
            (
                F.col("_two_s1")
                - (F.col("n_keys") + F.lit(1)) * F.col("n_rows")
            ).cast("double")
            / (F.col("n_keys") * F.col("n_rows")).cast("double")
        ).alias("gini"),
    )


def salt_explode_small(
    big: DataFrame,
    small: DataFrame,
    key: str,
    big_salt_source: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side.

    Equivalent rows to ``big.join(small, key, how)`` but the hot key's rows
    spread over ``buckets`` reducers. Use when the small side is too big to
    broadcast but the key distribution is skewed.
    """
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(big_salt_source)), F.lit(buckets))
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return b.join(s, on=[key, "_salt"], how=how).drop("_salt")
