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
