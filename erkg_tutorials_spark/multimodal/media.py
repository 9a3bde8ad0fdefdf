"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY.md north-star extension).

The Spark-side plumbing is real and tested — schema, Arrow batch
shapes, ``mapInPandas`` signatures, partition behavior. The *codec*
layer is stubbed: the actual image/audio libraries are not in this
container, so decoding is a deterministic fake derived from the bytes
(md5-seeded), clearly marked. Swap ``_decode_stub`` for a PIL/librosa
call and nothing else changes.

Design for 100 TB of media: binaries stay in the executor data path
end-to-end (parquet binary column → Arrow record batches → pandas
bytes), never on the driver; feature extraction is per-partition
streaming with bounded batch size (`spark.sql.execution.arrow
.maxRecordsPerBatch` governs memory per batch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("content_hash", StringType()),
        StructField("feat_0", DoubleType()),
        StructField("feat_1", DoubleType()),
    ]
)


def _decode_stub(payload: bytes) -> dict:
    """STUB decoder — deterministic fake in lieu of PIL/librosa/ffmpeg
    (not available in this container). Derives stable pseudo-features
    from the bytes so the pipeline around it is fully testable.
    Replace with a real codec: the contract is bytes -> dict of floats.
    """
    if payload is None:
        raise NotImplementedError(
            "real media decoding requires an image/audio codec; "
            "this environment ships none (stub operates on raw bytes only)"
        )
    digest = hashlib.md5(payload).digest()
    return {
        "mean_byte": sum(payload) / max(len(payload), 1),
        "feat_0": int.from_bytes(digest[:4], "big") / 2**32,
        "feat_1": int.from_bytes(digest[4:8], "big") / 2**32,
        "content_hash": digest.hex(),
    }


def decode_features(media: DataFrame) -> DataFrame:
    """Per-media feature extraction via mapInPandas (Arrow-batched;
    binaries never leave the executors)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "mean_byte": [f["mean_byte"] for f in feats],
                    "content_hash": [f["content_hash"] for f in feats],
                    "feat_0": [f["feat_0"] for f in feats],
                    "feat_1": [f["feat_1"] for f in feats],
                }
            )

    return media.mapInPandas(extract, FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: payload → payload' with updated meta.
    The pixel transform is the stub (real impl: PIL thumbnail); the
    schema/meta handling is the real contract."""
    out_schema = MEDIA_SCHEMA

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # STUB: a real resize decodes + rescales; the deterministic
            # fake truncates payload proportionally to the area ratio.
            def fake_resize(row):
                meta = dict(row["meta"]) if row["meta"] is not None else {}
                old_area = (meta.get("width") or 1) * (meta.get("height") or 1)
                ratio = min(1.0, (width * height) / max(old_area, 1))
                n = max(1, int(len(row["payload"]) * ratio))
                meta.update({"width": width, "height": height})
                return row["payload"][:n], meta

            resized = pdf.apply(fake_resize, axis=1)
            pdf = pdf.assign(
                payload=[r[0] for r in resized], meta=[r[1] for r in resized]
            )
            yield pdf

    return media.mapInPandas(resize, out_schema)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.
    STUB frame extraction slices the payload deterministically."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row["kind"] != "video":
                    continue
                n_frames = (row["meta"]["n_frames"] if row["meta"] is not None else 0) or 0
                payload = row["payload"]
                for fno in range(0, n_frames, every_n):
                    # STUB: real impl seeks the container; fake slices bytes
                    chunk = len(payload) // max(n_frames, 1)
                    rows.append(
                        (row["media_id"], fno, payload[fno * chunk:(fno + 1) * chunk])
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return media.mapInPandas(sample, schema)
