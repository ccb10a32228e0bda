"""Changelog compaction: latest-row-per-key snapshot (CDC upsert/delete
semantics) as ONE aggregate.

The lakehouse maintenance shape (Iceberg/Delta changelog -> current
state, Hudi compaction): a crawl pipeline re-fetches pages, so the pages
table is an append-only changelog of (url, warc_ts, payload) versions and
every consumer wants "the newest row per url". At 10^12 rows the standard
``row_number() OVER (PARTITION BY key ORDER BY ts DESC) = 1`` is the
hot-key trap this engine bans everywhere (a re-crawled-hourly URL's whole
history buffers through ONE window task); the snapshot here is a
``max_by(payload_struct, order_struct)`` AGGREGATE — map-side partial
combine reduces each partition's contribution to one row per key before
the single exchange (the ``assign_senses`` discipline, CLAUDE.md).

Determinism: the order key is ``(ts, tiebreak)`` with an explicit
caller-named tiebreak column — equal-timestamp updates resolve
identically at any parallelism (struct comparison is lexicographic in
both engines; the oracle replays it as ``ORDER BY ts DESC, tiebreak
DESC``).

Optional delete semantics: with ``op_col``, a key whose LATEST op equals
``delete_value`` disappears from the snapshot (tombstone wins only if it
is newest — earlier deletes are superseded by later upserts, exactly the
changelog-merge rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Type-2 slowly-changing-dimension compaction of a changelog:
    collapse consecutive same-state versions per key, then attach
    validity intervals — the entity-history table an incremental ER
    pipeline keeps next to its :func:`latest_snapshot` (the snapshot is
    "what is true now", this is "what was true when", the input to
    point-in-time joins via :func:`~.temporal.asof_join`).

    Semantics per key, ordered by ``(ts, tiebreak)``:

    * a row opens a new validity interval iff its ``attr_cols`` tuple
      differs from the previous row's (NULL-safe comparison — an
      all-NULL state change is still a change);
    * ``valid_from`` = its ``ts``; ``valid_to`` = the NEXT opener's
      ``ts`` (NULL on the current version); ``is_current`` flags the
      open interval; ``n_versions`` counts the raw changelog rows the
      interval absorbed.

    Scale shape: two window passes over the SAME ``(key)`` partitioning
    / ``(ts, tiebreak)`` ordering — one Exchange, the second window
    reuses the sort. Per-key history length is bounded by re-crawl
    cadence (never by corpus size), so the per-key window buffer is the
    RIGHT tool here, unlike the hot-hash groups this engine converts to
    aggregates (``exact_duplicates``) — the skew unit is versions of one
    entity, not members of one value.

    Determinism: ``tiebreak_col`` makes equal-``ts`` updates order
    identically at any parallelism; the change predicate is
    ``NOT (prev <=> cur)`` on a struct (null-safe equal), replayed in
    the oracle as ``IS DISTINCT FROM``.

    Reference parity: the reference's eval keeps per-example history
    only implicitly (benchmark reruns, wsd/benchmark.py:41-77); the
    changelog-to-interval compaction itself is the lakehouse-standard
    construction (Kimball SCD type 2).
    """
    from pyspark.sql import Window

    worder = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(*key_cols).orderBy(*worder)
    state = F.struct(*[F.col(c) for c in attr_cols])
    versioned = df.withColumn(
        "_chg",
        F.when(
            F.lag(state).over(w).eqNullSafe(state), F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("_ver", F.sum("_chg").over(w))
    opened = versioned.groupBy(*key_cols, "_ver").agg(
        F.min(F.col(ts_col)).alias("valid_from"),
        F.max_by(
            F.struct(*[F.col(c) for c in attr_cols]),
            F.struct(F.col(ts_col), F.col(tiebreak_col)),
        ).alias("_state"),
        F.count("*").cast("long").alias("n_versions"),
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col("_ver").asc())
    return opened.select(
        *key_cols,
        *[F.col(f"_state.{c}").alias(c) for c in attr_cols],
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_versions",
    )


def latest_snapshot(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    op_col: str | None = None,
    delete_value: str = "d",
) -> DataFrame:
    """Newest row per key from an append-only changelog.

    Output columns = input columns (one row per surviving key). All
    non-key columns ride inside the ``max_by`` payload struct, so the
    operator is a single groupBy with partial combine — never a window.
    """
    payload_cols = [c for c in df.columns if c not in key_cols]
    order = F.struct(F.col(ts_col).alias("_t"), F.col(tiebreak_col).alias("_i"))
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload_cols]), order).alias("_p")
    )
    out = agg.select(
        *key_cols, *[F.col(f"_p.{c}").alias(c) for c in payload_cols]
    )
    if op_col is not None:
        out = out.filter(F.col(op_col) != F.lit(delete_value))
    return out
