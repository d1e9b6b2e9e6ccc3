"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``
(BASELINE.json north star).

The Spark-side plumbing is real — schema, batch iteration, partition
behavior — while the codec itself is swappable:

- ``decode_media(..., codec="fake")`` uses a deterministic md5-derived
  decoder (so results are oracle-checkable and tests are hermetic);
- ``codec="real"`` raises ``NotImplementedError`` where Pillow/ffmpeg
  calls belong (those libraries aren't in this container). The batch
  shape, schema, and partitioning don't change between codecs — swap
  the codec, keep the pipeline.

Scale notes: payloads never leave their partition (mapInPandas is a
narrow transform); Arrow moves each batch across the Python boundary
once; metadata-only queries prune the binary column at the parquet
scan, so "list all 4K videos" never reads bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_source", StringType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("feat_0", DoubleType()),
        StructField("feat_1", DoubleType()),
    ]
)


def _fake_decode_one(media_id: int, media_type: str, payload: bytes) -> tuple:
    """Deterministic stand-in for a real codec: dimensions and features
    derived from md5(payload) — reproducible in SQL for the oracle."""
    h = hashlib.md5(payload if payload is not None else b"").hexdigest()
    width = int(h[0:4], 16) % 1920 + 1
    height = int(h[4:8], 16) % 1080 + 1
    n_frames = (int(h[8:12], 16) % 240 + 1) if media_type == "video" else 1
    feat_0 = int(h[12:20], 16) / float(0xFFFFFFFF)
    feat_1 = int(h[20:28], 16) / float(0xFFFFFFFF)
    return media_id, media_type, width, height, n_frames, feat_0, feat_1


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """payload → features, one Arrow batch at a time (no shuffle)."""
    if codec == "real":
        raise NotImplementedError(
            "real decode requires image/audio libs not present in this "
            "container; the 'fake' codec exercises identical plumbing"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _fake_decode_one(m, t, p)
                for m, t, p in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "width", "height",
                    "n_frames", "feat_0", "feat_1",
                ],
            )

    return media.mapInPandas(decode_batches, FEATURES_SCHEMA)


def frame_sample_plan(features: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index.

    Pure column math (sequence + explode) — the decode of each sampled
    frame would run in a second mapInPandas over (media_id, frame_idx).
    """
    return (
        features.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )


def resize_spec(features: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning: target dims preserving aspect ratio (longest
    side → max_side). Integer math matches the SQL oracle exactly."""
    w, h = F.col("width"), F.col("height")
    scale_w = (w >= h)
    # floor, not cast: SQL engines disagree on double→int rounding
    tw = F.when(scale_w, F.lit(max_side).cast("long")).otherwise(
        F.floor(w * max_side / h)
    )
    th = F.when(scale_w, F.floor(h * max_side / w)).otherwise(
        F.lit(max_side).cast("long")
    )
    return features.select(
        "media_id", "media_type", "width", "height",
        tw.alias("target_w"), th.alias("target_h"),
    )


AUDIO_SEG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("seg_idx", LongType()),
        StructField("start_sample", LongType()),
        StructField("end_sample", LongType()),
        StructField("seg_feat", DoubleType()),
    ]
)


def segment_audio(
    media: DataFrame,
    window: int = 160_000,
    hop: int = 80_000,
    codec: str = "fake",
) -> DataFrame:
    """Fixed-window audio segmentation: one output row per (clip,
    window) — the 1→N ``mapInPandas`` shape (mm1's decode is 1→1).

    A real pipeline would decode PCM and emit per-window features
    (energy, MFCC); the fake codec derives sample_rate / n_samples /
    per-segment features from md5 so the oracle can reproduce every
    value. The batch contract is the part that matters at scale: each
    Arrow batch of clips expands to its segments WITHIN the same task
    (narrow, no shuffle), so segmentation parallelism equals scan
    parallelism and payload bytes never move between executors.
    """
    if codec == "real":
        raise NotImplementedError(
            "real segmentation requires audio libs not present in this "
            "container; the 'fake' codec exercises identical plumbing"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    def seg_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in AUDIO_SEG_SCHEMA.fieldNames()}
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                h = hashlib.md5(payload).hexdigest()
                rate = 8000 + (int(h[0:4], 16) % 5) * 8000
                n_samples = int(h[4:10], 16) % 480_000 + 16_000
                n_segs = (n_samples - 1) // hop + 1
                for seg in range(n_segs):
                    hh = hashlib.md5(
                        payload + b":" + str(seg).encode()
                    ).hexdigest()
                    start = seg * hop
                    out["media_id"].append(m)
                    out["sample_rate"].append(rate)
                    out["n_samples"].append(n_samples)
                    out["seg_idx"].append(seg)
                    out["start_sample"].append(start)
                    out["end_sample"].append(min(start + window, n_samples))
                    out["seg_feat"].append(
                        int(hh[0:8], 16) / float(0xFFFFFFFF)
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        seg_batches, AUDIO_SEG_SCHEMA
    )
