"""Custom stateful streaming operator: cross-batch exact dedup.

``applyInPandasWithState`` keyed by content hash: the first arrival of each
content hash passes through, later arrivals (within a batch or across
micro-batches) are dropped — the streaming form of the exact-dedup operator,
with state = one seen-flag per content hash. This is the engine's template
for custom stateful operators (the build brief's
``applyInPandasWithState`` requirement); watermark/TTL handling would bound
state on an unbounded stream (state here is GroupState with no timeout —
set a timeout for production crawls).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "content_hash string, url string, first_seen boolean"
STATE_SCHEMA = "seen boolean"


def _dedup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
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
    if out:
        yield pd.concat(out, ignore_index=True)


def stream_exact_dedup(
    spark: SparkSession,
    pages_dir: str,
    pages_schema: str,
    checkpoint_dir: str,
    out_dir: str,
) -> DataFrame:
    """Run the stateful dedup over all currently-available files; returns
    the accumulated (content_hash, url, first_seen) table. Re-running after
    new files arrive processes only the new ones (checkpointed offsets) and
    remembers every hash seen before (checkpointed state)."""
    stream = (
        spark.readStream.schema(pages_schema)
        .parquet(pages_dir)
        .select(F.sha2(F.col("text"), 256).alias("content_hash"), "url")
        .groupBy("content_hash")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
