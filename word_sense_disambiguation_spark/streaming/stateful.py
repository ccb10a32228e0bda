"""Custom stateful streaming operator: cross-batch exact dedup.

``applyInPandasWithState`` keyed by content hash: the first arrival of each
content hash passes through, later arrivals (within a batch or across
micro-batches) are dropped — the streaming form of the exact-dedup operator,
with state = one seen-flag per content hash. This is the engine's template
for custom stateful operators (the build brief's
``applyInPandasWithState`` requirement).

State is BOUNDED on an unbounded crawl via a processing-time TTL: pass
``ttl_ms`` and every key's state expires that long after its last arrival
(the timeout invocation removes it), so a hash seen again later re-admits
as first_seen — the usual recency-window dedup contract. ``ttl_ms=None``
keeps state forever (bounded-input jobs only).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "content_hash string, url string, first_seen boolean"
STATE_SCHEMA = "seen boolean"


def _make_dedup_fn(ttl_ms: int | None):
    def _dedup_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # recency window elapsed with no new arrivals: forget the hash
            # so a later arrival re-admits as first_seen
            state.remove()
            return
        seen = state.get[0] if state.exists else False
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("url")
            flags = []
            for _ in range(len(pdf)):
                flags.append(not seen)
                seen = True
            out.append(
                pd.DataFrame(
                    {
                        "content_hash": key[0],
                        "url": pdf["url"].to_numpy(),
                        "first_seen": flags,
                    }
                )
            )
        state.update((seen,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.concat(out, ignore_index=True)

    return _dedup_fn


def stream_exact_dedup(
    spark: SparkSession,
    pages_dir: str,
    pages_schema: str,
    checkpoint_dir: str,
    out_dir: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Run the stateful dedup over all currently-available files; returns
    the accumulated (content_hash, url, first_seen) table. Re-running after
    new files arrive processes only the new ones (checkpointed offsets) and
    remembers every hash seen within the TTL window (checkpointed state);
    with ``ttl_ms`` set, keys idle longer than the TTL are evicted, so
    state size tracks the recency window, not the whole crawl history."""
    stream = (
        spark.readStream.schema(pages_schema)
        .parquet(pages_dir)
        .select(F.sha2(F.col("text"), 256).alias("content_hash"), "url")
        .groupBy("content_hash")
        .applyInPandasWithState(
            _make_dedup_fn(ttl_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if ttl_ms is None:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        # With processing-time timeouts registered, the engine schedules
        # wakeup batches indefinitely, so neither availableNow nor
        # processAllAvailable ever reaches "idle" in this drain-style
        # runner (a real deployment just leaves the query running).
        # This operator emits exactly one output row per input row, so
        # drain = wait until the committed sink catches up to the source,
        # then stop; expirations fire on later runs' data batches (the
        # documented ProcessingTimeTimeout contract).
        import time as _time

        expected = spark.read.parquet(pages_dir).count()
        q = writer.start()

        def _out_rows() -> int:
            try:
                return spark.read.parquet(out_dir).count()
            except Exception:  # sink not created yet
                return -1

        deadline = _time.monotonic() + 180
        try:
            while _time.monotonic() < deadline and _out_rows() < expected:
                _time.sleep(0.25)
        finally:
            q.stop()
        q.awaitTermination()
        if _out_rows() < expected:
            raise RuntimeError("stream_exact_dedup: sink did not catch up")
    return spark.read.parquet(out_dir)
