"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode layers, honestly separated:

* :func:`parse_image_dims` — REAL header parsing for the two formats a web
  crawl actually contains: PNG (IHDR chunk) and JPEG (SOFn segment scan).
  Pure-Python byte math, no codec library needed; hash-checked by the
  ``image_header_dims`` driver oracle over synthesized valid headers.
* :func:`_fake_decode` — deterministic stand-in for payloads that are
  neither (video and friends): the container has no ffmpeg.
* :func:`real_decode` — the full pixel-decode hook, STUB by design.

The Spark-side contract is real and tested either way: schema, Arrow batch
shape, partition-preserving ``mapInPandas``, and the metadata struct a
downstream trainer would join on.
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

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# every JPEG frame-header marker that carries dimensions (SOF0-15 minus
# DHT/JPG/DAC which share the 0xCx range but are not frame headers)
_JPEG_SOF_MARKERS = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def parse_image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """Header-only dimension parse: ``(media_type, width, height)`` for PNG
    and JPEG payloads, ``None`` for anything else.

    PNG: the IHDR chunk is mandated to be first, so width/height are the
    two big-endian u32 at bytes 16..24. JPEG: walk the segment chain from
    SOI, skipping non-frame segments by their big-endian length, until a
    SOFn marker; height/width are the two big-endian u16 after the
    precision byte. Truncated/malformed payloads return None (caller falls
    back to the fake decoder) — never raise on crawl garbage.
    """
    if (
        len(payload) >= 24
        and payload[:8] == _PNG_MAGIC
        and payload[12:16] == b"IHDR"
    ):
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return ("png", w, h)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None  # not a marker where one must be: malformed
            # 0xFF fill bytes before a marker are legal padding (ITU T.81
            # B.1.1.2) and common in real files: skip the run so a fill
            # byte is never misread as a length-bearing segment marker.
            while i + 4 <= len(payload) and payload[i + 1] == 0xFF:
                i += 1
            if i + 4 > len(payload):
                return None
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI before any SOF
                return None
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 > len(payload):
                    return None
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seg_len
    return None


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a video/audio decoder: derives fake
    (width, height, n_frames) from the payload's leading bytes. Replace
    with a real codec on a cluster with media libraries installed."""
    if len(payload) < 8:
        return (0, 0, 0)
    w, h = struct.unpack("<HH", payload[:4])
    return (w % 4096 + 1, h % 4096 + 1, payload[4] % 64 + 1)


def real_decode(payload: bytes):  # pragma: no cover - stub by design
    """The full pixel-decode hook. STUB: media codecs are not available in
    this environment; header-level metadata IS real (parse_image_dims) and
    the Spark plumbing around both is fully implemented."""
    raise NotImplementedError(
        "pixel decoding requires PIL/ffmpeg; not available in this container"
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
                parsed = parse_image_dims(b)
                if parsed is not None:
                    mt, w, h = parsed
                    nf = 1  # a still image is one frame
                else:
                    w, h, nf = _fake_decode(b)
                    mt = media_type
                rows.append(
                    {
                        "url": url,
                        "media_type": mt,
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


def resize_metadata(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "html",
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """Resize plumbing: decode (stub/fake) -> per-payload scale factors.

    A real resize kernel slots into the same Arrow pass; the schema and
    the single-IEEE-division scale math are the contract (oracle-exact).
    """
    from pyspark.sql import functions as F

    meta = media_metadata(df, url_col, payload_col)
    return meta.select(
        "url",
        "width",
        "height",
        F.lit(target_w).alias("target_w"),
        F.lit(target_h).alias("target_h"),
        (F.lit(float(target_w)) / F.col("width").cast("double")).alias("scale_x"),
        (F.lit(float(target_h)) / F.col("height").cast("double")).alias("scale_y"),
    )


def payload_byte_histogram(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "html",
    head: int = 256,
) -> DataFrame:
    """Feature-extract plumbing: 16-bin high-nibble byte histogram of the
    payload head, emitted as (url, bin, frac) rows. The deterministic
    stand-in for a real image/audio feature extractor — swap the kernel,
    keep the Arrow batch shape, schema, and exact count/head fractions
    (integer-over-power-of-two: oracle-exact doubles).
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, bins, fracs = [], [], []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                h = np.frombuffer(b[:head], dtype=np.uint8)
                counts = np.bincount(h >> 4, minlength=16)
                denom = max(len(h), 1)
                for i in range(16):
                    urls.append(url)
                    bins.append(i)
                    fracs.append(counts[i] / denom)
            yield pd.DataFrame({"url": urls, "bin": pd.Series(bins, dtype="int32"),
                                "frac": pd.Series(fracs, dtype="float64")})

    return df.select(url_col, payload_col).mapInPandas(
        run, schema="url string, bin int, frac double"
    )


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
