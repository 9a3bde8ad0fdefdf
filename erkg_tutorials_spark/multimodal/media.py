"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY.md north-star extension).

The Spark-side plumbing is real and tested — schema, Arrow batch
shapes, ``mapInPandas`` signatures, partition behavior. The *codec*
layer is two-tier (r3): a real PIL image path used when Pillow is
importable in the runtime (``codec="auto"``/"pil"), and the
deterministic md5-seeded fake (``codec="stub"``, the default — it
backs the registered oracle query, so correctness replay never
depends on an optional package). Audio/video decode remains stubbed:
no librosa/ffmpeg tier exists yet, and the stub raises loudly on a
null payload rather than fabricating features.

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


def pil_available() -> bool:
    """True iff Pillow is importable in this runtime."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def _decode_pil(payload: bytes, kind: str) -> dict:
    """Real image decode via Pillow. Feature contract mirrors the stub
    schema: mean_byte = mean pixel value over all bands, feat_0/feat_1
    = width/height normalized into [0, 1) by the 16-bit dimension cap,
    content_hash = md5 of the *pixel* bytes (codec-container
    independent, unlike the stub's payload hash)."""
    import io

    import PIL.Image

    if payload is None:
        raise NotImplementedError("null payload: nothing to decode")
    if kind != "image":
        # no real audio/video tier yet — fall back to the stub rather
        # than pretend PIL understands the container
        return _decode_stub(payload)
    with PIL.Image.open(io.BytesIO(payload)) as img:
        pixels = img.tobytes()
        return {
            "mean_byte": sum(pixels) / max(len(pixels), 1),
            "feat_0": img.width / 2**16,
            "feat_1": img.height / 2**16,
            "content_hash": hashlib.md5(pixels).hexdigest(),
        }


def _pick_codec(codec: str):
    if codec == "pil" or (codec == "auto" and pil_available()):
        return _decode_pil
    if codec in ("auto", "stub"):
        return lambda payload, kind: _decode_stub(payload)
    raise ValueError(f"unknown codec {codec!r} (expected stub|pil|auto)")


def decode_features(media: DataFrame, codec: str = "stub") -> DataFrame:
    """Per-media feature extraction via mapInPandas (Arrow-batched;
    binaries never leave the executors).

    ``codec``: "stub" (default — deterministic, oracle-replayable),
    "pil" (real image decode, raises if Pillow missing on executors),
    or "auto" (pil when importable, stub otherwise)."""
    decode = _pick_codec(codec)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
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


def resize_images(
    media: DataFrame, width: int, height: int, codec: str = "stub"
) -> DataFrame:
    """Image resize: payload → payload' with updated meta.

    ``codec="pil"``/"auto": real decode → ``Image.resize`` → PNG
    re-encode on the executors. ``codec="stub"`` (default): the
    deterministic fake (payload truncated by area ratio) — the
    schema/meta handling is identical, which is the tested contract."""
    out_schema = MEDIA_SCHEMA
    use_pil = codec == "pil" or (codec == "auto" and pil_available())
    if codec not in ("stub", "pil", "auto"):
        raise ValueError(f"unknown codec {codec!r} (expected stub|pil|auto)")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_pil:
            import io

            import PIL.Image

        def pil_resize(row):
            meta = dict(row["meta"]) if row["meta"] is not None else {}
            if row["kind"] != "image":
                return row["payload"], meta
            with PIL.Image.open(io.BytesIO(row["payload"])) as img:
                out = io.BytesIO()
                img.resize((width, height)).save(out, format="PNG")
            meta.update({"width": width, "height": height, "format": "png"})
            return out.getvalue(), meta

        def fake_resize(row):
            # STUB: a real resize decodes + rescales; the deterministic
            # fake truncates payload proportionally to the area ratio.
            meta = dict(row["meta"]) if row["meta"] is not None else {}
            old_area = (meta.get("width") or 1) * (meta.get("height") or 1)
            ratio = min(1.0, (width * height) / max(old_area, 1))
            n = max(1, int(len(row["payload"]) * ratio))
            meta.update({"width": width, "height": height})
            return row["payload"][:n], meta

        xform = pil_resize if use_pil else fake_resize
        for pdf in batches:
            resized = pdf.apply(xform, axis=1)
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
