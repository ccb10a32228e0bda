"""Portable cardinality sketches: an integer-exact HyperLogLog.

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
