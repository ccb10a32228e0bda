"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode kernels* are
deterministic fakes / clearly-marked stubs — but the Spark-side contract is
real and tested: schema, Arrow batch shape, partition-preserving
``mapInPandas``, and the metadata struct a downstream trainer would join on.
Swap ``_fake_decode`` for a PIL/ffmpeg call on a real cluster; nothing else
changes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "url string, media_type string, n_bytes long, width int, height int, "
    "n_frames int, sample_hash long"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video decoder: derives fake
    (width, height, n_frames) from the payload's leading bytes. Replace
    with a real codec on a cluster with media libraries installed."""
    if len(payload) < 8:
        return (0, 0, 0)
    w, h = struct.unpack("<HH", payload[:4])
    return (w % 4096 + 1, h % 4096 + 1, payload[4] % 64 + 1)


def real_decode(payload: bytes):  # pragma: no cover - stub by design
    """The real decode hook. STUB: media codecs are not available in this
    environment; the Spark plumbing around it is fully implemented."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg; not available in this container"
    )


def media_metadata(
    df: DataFrame, url_col: str = "url", payload_col: str = "html",
    media_type: str = "binary",
) -> DataFrame:
    """binary column -> typed metadata rows (one per payload).

    The batch shape matters at scale: one Arrow batch in, one pandas frame
    out, no per-row serde, partitioning preserved (no shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                w, h, nf = _fake_decode(b)
                rows.append(
                    {
                        "url": url,
                        "media_type": media_type,
                        "n_bytes": len(b),
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        # stable across executors (python hash() is
                        # process-randomized; never use it in a UDF)
                        "sample_hash": int.from_bytes(
                            hashlib.md5(b[:64]).digest()[:8], "little"
                        )
                        & 0x7FFFFFFFFFFFFFFF,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "url", "media_type", "n_bytes", "width", "height",
                "n_frames", "sample_hash",
            ])

    return df.select(url_col, payload_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)


def frame_sample(
    df: DataFrame, url_col: str = "url", payload_col: str = "html", every_n: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: emits (url, frame_no) for every ``every_n``-th
    fake frame. The decode itself is the stub above."""
    from pyspark.sql import functions as F

    meta = media_metadata(df, url_col, payload_col)
    return meta.select(
        "url",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_no"),
    )
