"""Portable sketches: an integer-exact HyperLogLog (cardinality) and a
Count-Min sketch (frequency / heavy hitters).

Spark's built-in ``approx_count_distinct`` is a black-box HLL++ whose
registers depend on Spark's internal hash — useless for cross-engine
verification and for sketch UNION with non-Spark producers. This one is
built from the engine's portable primitives (60-bit md5-prefix hashes,
integer register math), so the SAME input yields the SAME registers, the
same exact BIGINT denominator, and the same estimate in Spark, DuckDB, or
a python replay — ``local[1] == local[32] == DuckDB`` bit-for-bit. The
floating point surface is ONE multiply-free division at the end (the
alpha*m^2*2^55 numerator is a single pre-folded double literal).

Flajolet et al. 2007 (HyperLogLog), raw estimator without the
small-range/large-range corrections — those need ``ln``/``log`` whose
last-ulp behavior differs across libms, so instead of hiding a
nondeterministic branch the sketch EMITS the exact integer fields
(``denom_scaled``, ``n_zero_registers``) a consumer needs to apply any
correction policy; the raw estimate's error is the standard
``1.04/sqrt(m)``.

Scale shape: two aggregations — ``groupBy(keys, bucket).max(rank)``
(map-side partial combine: a 10^10-row key costs m rows per map
partition) then ``groupBy(keys)`` over at most ``m`` register rows per
key. A hot key is structurally incapable of skewing the second stage.
Sketches MERGE by max over registers, which is exactly re-running the
operator over a union — no separate merge path to maintain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^55: rank <= 55, so 2^(55-rank) >= 1; an empty register contributes
# 2^55 and m=64 of them sum to 2^61 — exact in a signed long.
_POW55 = 1 << 55


def hll_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    m: int = 64,
    alpha: float = 0.709,
) -> DataFrame:
    """Per-key approximate distinct count of ``value_col``. Output:
    ``(*key_cols, m, n_zero_registers, denom_scaled, estimate)``.

    Registers: ``bucket = h % m``, ``rank = 1 + leading-zeros of the
    remaining 54 bits`` (via binary-string length — no float log
    anywhere), register value ``M_j = max(rank)``. The denominator
    ``sum_j 2^(55 - M_j)`` is EXACT BIGINT arithmetic (absent registers
    contribute ``2^55``); the estimate is
    ``alpha * m^2 * 2^55 / denom_scaled`` with the numerator pre-folded
    in python to one double literal, so the single division is the only
    FP op and replays identically in any IEEE engine. NULL values are
    ignored (SQL distinct semantics). ``m`` must be a power of two
    <= 16384; ``alpha`` defaults to the m=64 constant — pass the
    matching constant when changing ``m``.
    """
    if m & (m - 1) or not 0 < m <= 16384:
        raise ValueError("m must be a power of two in (0, 16384]")
    numer = float(alpha) * float(m) * float(m) * float(_POW55)

    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.shiftright(h, int(m).bit_length() - 1)  # literal shift: int arg ok
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    rank = F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - bitlen)

    regs = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *[F.col(k) for k in key_cols],
            (h % m).alias("_bucket"),
            rank.alias("_rank"),
        )
        .groupBy(*key_cols, "_bucket")
        .agg(F.max("_rank").alias("_m"))
    )
    agg = regs.groupBy(*key_cols).agg(
        # shiftleft with a COLUMN bit count needs the SQL form — the
        # PySpark wrapper only takes a literal int.
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - _m)"))
        .cast("long")
        .alias("_present"),
        F.count(F.lit(1)).cast("long").alias("_nreg"),
    )
    denom = (F.col("_present") + (F.lit(m) - F.col("_nreg")) * F.lit(_POW55)).cast(
        "long"
    )
    return agg.select(
        *key_cols,
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("_nreg")).cast("long").alias("n_zero_registers"),
        denom.alias("denom_scaled"),
        (F.lit(numer) / denom.cast("double")).alias("estimate"),
    )


# --- Count-Min sketch (Cormode & Muthukrishnan 2005) -------------------
#
# Integer-exact by construction: counters are BIGINT sums, the d row
# hashes are the engine's portable 60-bit md5-prefix primitive — the
# SAME input yields the SAME d x w counter table in Spark, DuckDB, or a
# python replay, and estimates are one-sided (est >= true count) with
# the standard eps = e/w, delta = e^-d guarantee. Sketches MERGE by
# elementwise counter addition, which is exactly re-running the
# operator over a union — no separate merge path.
#
# When to reach for it: in a closed batch world a plain partial-combined
# groupBy().count() is strictly cheaper and exact. The sketch earns its
# keep when the summary must LEAVE the engine — a fixed d*w-row table
# (independent of corpus size) shipped to a driver, a feature store, or
# merged across days — or when query items arrive AFTER the corpus scan
# and re-scanning 100 TB per probe set is off the table.


def _cms_probes(item_col: str, d: int, w: int):
    """d (row, bucket) probe structs for one item: bucket_i =
    md5-60bit(f"{i}:" + item) % w — row-salted so the d hashes are
    independent."""
    out = []
    for i in range(d):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), F.col(item_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        out.append(
            F.struct(
                F.lit(i).cast("int").alias("cms_row"),
                (h % w).cast("int").alias("cms_bucket"),
            )
        )
    return F.array(*out)


def cms_sketch(
    df: DataFrame,
    item_col: str,
    d: int = 4,
    w: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the d x w counter table: ``(cms_row, cms_bucket,
    cms_count)``, at most ``d * w`` rows regardless of input size.

    Scale shape: explode(d) -> ONE partial-combined hash aggregate on
    (row, bucket); a 10^10-row hot item collapses to d rows per map
    partition before the (at-most-d*w-key) shuffle. NULL items are
    ignored. ``weight_col`` (integral) turns it into a weighted sketch.
    """
    if d < 1 or w < 1:
        raise ValueError("need d >= 1 and w >= 1")
    weight = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(F.explode(_cms_probes(item_col, d, w)).alias("_p"), weight.alias("_w"))
        .groupBy(
            F.col("_p.cms_row").alias("cms_row"),
            F.col("_p.cms_bucket").alias("cms_bucket"),
        )
        .agg(F.sum("_w").cast("long").alias("cms_count"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Estimated count per distinct item in ``items``: ``(item_col,
    est_count)`` with ``est_count = min`` over the item's d counters
    (0 for an item the sketch never saw). ``d``/``w`` must match the
    sketch's build parameters.

    Scale shape: the sketch is <= d*w rows — broadcast — so probing is
    a map-side join plus ONE partial-combined min-aggregate on the item
    (duplicate probe rows for the same item are collapsed map-side and
    cannot skew; min over duplicated (row, bucket) hits equals min over
    the d counters).
    """
    probes = (
        items.filter(F.col(item_col).isNotNull())
        .select(F.col(item_col), F.explode(_cms_probes(item_col, d, w)).alias("_p"))
        .select(
            F.col(item_col),
            F.col("_p.cms_row").alias("cms_row"),
            F.col("_p.cms_bucket").alias("cms_bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["cms_row", "cms_bucket"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("cms_count"), F.lit(0).cast("long")))
            .cast("long")
            .alias("est_count")
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    item_col: str,
    threshold: int,
    d: int = 4,
    w: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Items whose Count-Min estimate is >= ``threshold`` — a
    guaranteed SUPERSET of the true heavy hitters (one-sided error:
    est >= true, so nothing above the threshold is missed; collisions
    can only add false positives, bounded by eps = e/w of total mass).

    The corpus itself is the probe set (no separate distinct() pass:
    cms_estimate's min-aggregate dedups map-side), so the whole
    operator is one explode scan, one bounded groupBy, one broadcast
    probe join, one min-groupBy — no corpus-sized shuffle beyond the
    item aggregate itself.
    """
    sk = cms_sketch(df, item_col, d=d, w=w, weight_col=weight_col)
    est = cms_estimate(sk, df.select(item_col), item_col, d=d, w=w)
    return est.filter(F.col("est_count") >= int(threshold))
