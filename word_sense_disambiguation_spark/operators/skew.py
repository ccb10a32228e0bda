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
