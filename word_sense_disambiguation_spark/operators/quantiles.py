"""Exact per-group quantiles by order statistic (type-1 / lower
discrete quantile): for each group and each requested quantile ``p``
return the element at rank ``ceil(p * n)`` of the group's sorted
values.

Reference parity trail: the reference's evaluation layer reports only
means/accuracy (``/root/reference/wsd/benchmark.py``); percentile
reporting (p50/p90/p99 token counts, latency-style tail stats) is part
of the added large-scale curation surface, same family as
``operators/textstats.py``.

Determinism / oracle discipline: the target rank is computed in PURE
INTEGER arithmetic — ``p`` is passed as a rational ``(num, den)`` and
``k = (num * n + den - 1) DIV den`` (= ``ceil(num*n/den)``), clamped to
>= 1 — so there is NO float multiply whose last-ulp could disagree with
the true rank (``ceil(0.14 * 100)`` is 15 in IEEE doubles, not 14 — the
exact trap this avoids; pinned in test_quantiles). Ties in the value
column make row IDENTITY at a rank
ambiguous, but the VALUE at every rank is deterministic, and value is
all this emits.

Scale shape: the group sizes come from ONE partial-combined
``groupBy(keys).count()`` (a hot key costs one row per map partition),
broadcast back; the per-group sort is a ``row_number`` window — the
irreducible cost of an EXACT order statistic (rank selection needs the
group's total order; a hot key streams through one spilling sort task).
At a scale where that is unacceptable, trade exactness for
``F.percentile_approx`` (t-digest-style, fully partial-combined) — the
approximate path is deliberately NOT wrapped here because its output is
neither portable nor oracle-able.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_QUANTILES: tuple[tuple[str, int, int], ...] = (
    ("p50", 1, 2),
    ("p90", 9, 10),
    ("p99", 99, 100),
)


def group_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    quantiles: tuple[tuple[str, int, int], ...] = DEFAULT_QUANTILES,
) -> DataFrame:
    """Per-key exact quantiles of ``value_col``. Output:
    ``(*key_cols, quantile, q_rank, q_value)`` — one row per key per
    requested quantile (two quantiles that land on the same rank each
    still emit their own row).

    ``quantiles``: ``(label, num, den)`` rationals with
    ``0 < num <= den``; NULL values are excluded on both the rank and
    the count side (SQL aggregate semantics).
    """
    for label, num, den in quantiles:
        if not (0 < num <= den):
            raise ValueError(f"quantile {label}: need 0 < num <= den")

    vals = df.filter(F.col(value_col).isNotNull()).select(
        *key_cols, F.col(value_col)
    )
    counts = vals.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    ranked = vals.withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy(*key_cols).orderBy(F.col(value_col))
        ),
    )
    j = ranked.join(F.broadcast(counts), key_cols)

    def k_expr(num: int, den: int):
        # ceil(num*n/den) in integer arithmetic; DIV is SQL-form only.
        return F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"CAST(({num} * _n + {den - 1}) DIV {den} AS BIGINT)"),
        )

    hit = reduce(or_, [F.col("_r") == k_expr(n_, d_) for _, n_, d_ in quantiles])
    targets = F.array(
        *[
            F.struct(
                F.lit(label).alias("q"), k_expr(n_, d_).alias("k")
            )
            for label, n_, d_ in quantiles
        ]
    )
    return (
        j.filter(hit)  # codegen OR first: explode only the matched rows
        .select(
            *key_cols, F.col(value_col), F.col("_r"), F.explode(targets).alias("_t")
        )
        .filter(F.col("_t.k") == F.col("_r"))
        .select(
            *key_cols,
            F.col("_t.q").alias("quantile"),
            F.col("_t.k").alias("q_rank"),
            F.col(value_col).alias("q_value"),
        )
    )


def sampled_group_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    sample_id_col: str,
    rate_den: int,
    quantiles: tuple[tuple[str, int, int], ...] = DEFAULT_QUANTILES,
    salt: str = "qs",
) -> DataFrame:
    """The documented scale trade for :func:`group_quantiles`, made
    concrete: a DETERMINISTIC 1-in-``rate_den`` Bernoulli sample
    (portable md5 of ``sample_id_col``, never ``rand()``) followed by
    the exact order statistic ON THE SAMPLE.

    Why this is the 10^12-row path: the exact operator's hot-key sort
    task shrinks by ``rate_den``x while the rank arithmetic (and the
    whole oracle discipline) stays pure-integer-exact over the sampled
    multiset — unlike ``percentile_approx``, whose t-digest output is
    neither portable nor replayable. Sampling error is the standard
    order-statistic bound (rank p +- ~sqrt(p(1-p)/m) quantile-scale for
    sample size m); callers pick ``rate_den`` against their key sizes.
    The sample is a pure function of the row id, so ``local[1] ==
    local[32]`` and re-runs agree row-for-row.
    """
    keep = F.expr(
        f"pmod(CAST(conv(substr(md5(concat('{salt}:', "
        f"CAST({sample_id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT), "
        f"{rate_den}) = 0"
    )
    return group_quantiles(df.filter(keep), key_cols, value_col, quantiles)


def rank_buckets(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_buckets: int = 3,
    labels: tuple[str, ...] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-group exact rank bucketing — the CCNet head/middle/tail
    assignment: every row lands in the bucket its ``value_col`` rank
    (within its ``key_cols`` group) falls into, with the cut points
    being the EXACT type-1 order statistics at i/n_buckets. CCNet cuts
    each language's documents into perplexity tertiles and trains on
    the best; this is that stage, group- and bucket-count-generic.

    Scale shape: the cuts come from :func:`group_quantiles` (the same
    integer-exact ``ceil(i*n/den)`` rank arithmetic — NO new float
    surface), which contracts to ``n_buckets - 1`` rows per group; the
    tiny cut table pivots to one row per group, broadcasts, and the
    assignment is a pure-codegen CASE over ``value > cut`` indicators —
    NEVER a row_number over the data itself at assignment time, so a
    10^9-document language costs one broadcast join, not a sorted
    window. Ties AT a cut go to the LOWER bucket (strict ``>``), so
    the rule is a total function of the value — rows with equal values
    always share a bucket (a rank-split would tear them apart
    nondeterministically). NULL values keep a NULL bucket.

    ``labels`` are bucket names in ASCENDING value order (default
    ``b0..b{n-1}``); pass ``("tail", "middle", "head")`` for a
    quality-ascending CCNet labeling. Output: input columns +
    ``bucket_col``.
    """
    n_buckets = int(n_buckets)
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if labels is None:
        labels = tuple(f"b{i}" for i in range(n_buckets))
    if len(labels) != n_buckets:
        raise ValueError("need exactly n_buckets labels")
    qs = tuple((f"c{i}", i, n_buckets) for i in range(1, n_buckets))
    cuts = group_quantiles(df, key_cols, value_col, quantiles=qs)
    pivot = cuts.groupBy(*key_cols).agg(
        *[
            F.max(
                F.when(F.col("quantile") == f"c{i}", F.col("q_value"))
            ).alias(f"_cut{i}")
            for i in range(1, n_buckets)
        ]
    )
    j = df.join(F.broadcast(pivot), on=key_cols, how="left")
    idx = None
    for i in range(1, n_buckets):
        ind = F.when(F.col(value_col) > F.col(f"_cut{i}"), 1).otherwise(0)
        idx = ind if idx is None else idx + ind
    label_arr = F.array(*[F.lit(x) for x in labels])
    out = j.withColumn(
        bucket_col,
        F.when(
            F.col(value_col).isNotNull(),
            F.element_at(label_arr, idx + F.lit(1)),
        ),
    )
    return out.select(*df.columns, bucket_col)


def mad_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k_milli: int = 3500,
) -> DataFrame:
    """Robust per-group outlier flags via median/MAD — the corpus
    anomaly gate (a source whose document lengths suddenly include
    10^8-char blobs, a crawl segment with pathological token counts):
    mean/stddev break exactly when you need them (the outlier drags the
    mean), the median absolute deviation does not (50% breakdown
    point — Hampel's rule).

    A row is an outlier iff ``|value - median| > k * MAD`` with both
    order statistics EXACT type-1 medians from the integer ceil-rank
    machinery of :func:`group_quantiles`, and the comparison the
    integer cross-multiply ``|value - med| * 1000 > k_milli * mad`` —
    zero floats anywhere, so the flags replay bit-for-bit (the default
    k_milli=3500 is Hampel's 3.5, exact). Works on any integer-valued
    metric column (lengths, token counts, milli-scores). A
    degenerate group (MAD = 0: over half the values identical) flags
    every value differing from the median — documented and pinned, the
    conservative reading of Hampel on constant data.

    Scale shape: two quantile passes (value median, then deviation
    median), each contracting to ONE row per group through the
    group_quantiles machinery; the tiny (median, mad) table broadcasts
    back and the flag is pure codegen. NULL values keep NULL flags.

    Output: input columns + ``group_median``, ``group_mad`` (BIGINT)
    and ``is_outlier`` (BOOLEAN).
    """
    k_milli = int(k_milli)
    med = (
        group_quantiles(df, key_cols, value_col, quantiles=(("m", 1, 2),))
        .select(*key_cols, F.col("q_value").cast("long").alias("group_median"))
    )
    j = df.join(F.broadcast(med), on=key_cols, how="left")
    dev = j.filter(F.col(value_col).isNotNull()).select(
        *key_cols,
        F.abs(F.col(value_col) - F.col("group_median")).alias("_dev"),
    )
    mad = (
        group_quantiles(dev, key_cols, "_dev", quantiles=(("m", 1, 2),))
        .select(*key_cols, F.col("q_value").cast("long").alias("group_mad"))
    )
    out = j.join(F.broadcast(mad), on=key_cols, how="left")
    return out.select(
        *df.columns,
        "group_median",
        "group_mad",
        F.when(
            F.col(value_col).isNotNull(),
            F.abs(F.col(value_col) - F.col("group_median")) * 1000
            > F.lit(k_milli) * F.col("group_mad"),
        ).alias("is_outlier"),
    )
