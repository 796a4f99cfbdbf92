"""Multimodal (image/audio/video) column handling for training pipelines.

Media payloads are opaque ``binary`` columns with typed metadata — the same
pattern as the pages table's ``html`` column. The Spark-side plumbing
(schemas, Arrow batch shapes, partition-aware mapInPandas fan-out, feature
schema) is real and tested; the actual codec calls are STUBBED behind
``_decode_image_stub`` (this container ships no image/audio libraries) —
a deterministic fake that parses our self-describing fake-media header.
Swapping in Pillow/ffmpeg is a one-function change, the dataflow is final.

Ops:
- ``media_table_schema`` / ``make_fake_media``  — typed media rows with a
  deterministic synthetic payload (seeded, self-describing header).
- ``decode_image_features``  — mapInPandas over Arrow batches: binary →
  (width, height, n_bytes, mean_pixel, phash64). Vectorized per batch;
  numpy does the pixel math on the stub-decoded arrays.
- ``frame_sample``           — video → every k-th frame index list with
  per-frame byte offsets (pure column expressions over the header).
- ``resize_plan``            — target-size metadata (the shuffle-free
  projection a real resize UDF would follow).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

_MAGIC = b"FAKEMEDIA1"
_HEADER_FMT = "<10sHHI"  # magic, width, height, n_frames
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


def make_fake_media(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic synthetic media table. Payload = self-describing
    header + seeded pseudo-pixel bytes (stands in for a real codec
    payload; built driver-free via mapInPandas over spark.range)."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                rng = np.random.default_rng(seed + int(mid))
                kind = ["image", "audio", "video"][int(mid) % 3]
                w, h = 8 + int(mid) % 24, 8 + (int(mid) * 7) % 24
                frames = 1 if kind == "image" else 4 + int(mid) % 8
                pixels = rng.integers(0, 256, w * h * frames, dtype=np.uint8)
                payload = struct.pack(_HEADER_FMT, _MAGIC, w, h, frames) + pixels.tobytes()
                rows.append(
                    (
                        int(mid), kind, payload,
                        f"application/x-fake-{kind}", len(payload),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "mime", "n_bytes"]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """STUB decoder (no Pillow/ffmpeg in this container): parses the
    deterministic fake header. A production build replaces ONLY this
    function with a real codec call; everything downstream is unchanged.
    Raises on foreign payloads, mirroring real decoder behavior."""
    if payload[:10] != _MAGIC:
        raise NotImplementedError(
            "real image decoding not available in this environment; "
            "payload is not FAKEMEDIA"
        )
    magic, w, h, frames = struct.unpack(_HEADER_FMT, payload[:_HEADER_SIZE])
    px = np.frombuffer(payload, dtype=np.uint8, offset=_HEADER_SIZE)
    return w, h, frames, px


def decode_image_features(media: DataFrame) -> DataFrame:
    """binary payload → feature row, one vectorized mapInPandas pass:
    (media_id, width, height, n_frames, mean_pixel, phash64).

    phash64 = 64-bit average-hash over an 8×8 downsample of frame 0 —
    numpy-only, deterministic (a stand-in with the same shape as a real
    perceptual hash)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [],
                "n_frames": [], "mean_pixel": [], "phash64": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames, px = _decode_image_stub(bytes(payload))
                frame0 = px[: w * h].reshape(h, w).astype(np.float64)
                # 8x8 average downsample (pad-free: trim to multiples)
                th, tw = max(h // 8, 1), max(w // 8, 1)
                ds = frame0[: th * 8, : tw * 8].reshape(8, th, 8, tw).mean(
                    axis=(1, 3)
                )
                bits = (ds > ds.mean()).flatten()
                ph = 0
                for i, b in enumerate(bits):
                    if b:
                        ph |= (1 << i) if i < 63 else -(1 << 63)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(frames)
                out["mean_pixel"].append(float(px.mean()))
                out["phash64"].append(ph)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        feats,
        "media_id long, width int, height int, n_frames int, "
        "mean_pixel double, phash64 long",
    )


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """video rows → exploded (media_id, frame_idx, byte_offset) for every
    k-th frame. Pure column expressions over the self-describing header
    (real codecs expose the same index via container metadata)."""
    hdr = F.col("payload")
    width = F.conv(F.hex(F.reverse(F.substring(hdr, 11, 2))), 16, 10).cast("long")
    height = F.conv(F.hex(F.reverse(F.substring(hdr, 13, 2))), 16, 10).cast("long")
    frames = F.conv(F.hex(F.reverse(F.substring(hdr, 15, 4))), 16, 10).cast("long")
    frame_bytes = width * height
    vids = media.where(F.col("kind") == "video").select(
        "media_id",
        width.alias("width"),
        height.alias("height"),
        frames.alias("n_frames"),
        frame_bytes.alias("frame_bytes"),
    )
    idx = F.explode(
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
    ).alias("frame_idx")
    return vids.select("media_id", "frame_bytes", idx).select(
        "media_id",
        "frame_idx",
        (F.lit(_HEADER_SIZE) + F.col("frame_idx") * F.col("frame_bytes")).alias(
            "byte_offset"
        ),
    )


def resize_plan(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize metadata projection: scale factors + output byte budget —
    the partition-preserving plan a real resize kernel executes."""
    feats = decode_image_features(media)
    return feats.select(
        "media_id",
        "width",
        "height",
        (F.lit(target_w) / F.col("width")).alias("scale_x"),
        (F.lit(target_h) / F.col("height")).alias("scale_y"),
        F.lit(target_w * target_h).cast("long").alias("out_bytes_per_frame"),
    )
