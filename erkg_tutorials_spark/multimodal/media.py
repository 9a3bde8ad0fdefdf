"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY.md north-star extension).

The Spark-side plumbing is real and tested — schema, Arrow batch
shapes, ``mapInPandas`` signatures, partition behavior. The *codec*
layer is three-tier (r5): a real PIL image path used when Pillow is
importable in the runtime (``codec="auto"``/"pil"); a real pure
stdlib+numpy binary-PPM path (``codec="ppm"``) so an actual
decode→pixels→transform→re-encode cycle executes even where Pillow is
absent (this container — its goldens run unconditionally); and the
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


def _ppm_parse(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6) image: returns (width, height, rgb bytes).

    Pure-stdlib real codec — exists so a REAL decode→pixels→transform
    path executes even in runtimes without Pillow (this container).
    Handles the standard header grammar: tokens separated by
    whitespace, '#' comments, maxval must be 255."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (8-bit only)")
    pixels = payload[pos : pos + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return w, h, pixels


def ppm_encode(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6) encode of raw 8-bit RGB bytes."""
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def _decode_ppm(payload: bytes, kind: str) -> dict:
    """Real image decode for binary PPM via the stdlib parser. Feature
    contract identical to the PIL tier: mean_byte over pixel bytes,
    feat_0/feat_1 = width/height / 2^16, content_hash = md5 of the
    PIXEL bytes (container-independent)."""
    if payload is None:
        raise NotImplementedError("null payload: nothing to decode")
    if kind != "image":
        return _decode_stub(payload)
    w, h, pixels = _ppm_parse(payload)
    return {
        "mean_byte": sum(pixels) / max(len(pixels), 1),
        "feat_0": w / 2**16,
        "feat_1": h / 2**16,
        "content_hash": hashlib.md5(pixels).hexdigest(),
    }


def best_real_codec() -> str:
    """The strongest REAL (non-stub) codec this runtime can execute:
    'pil' when Pillow is importable, else the stdlib 'ppm' tier."""
    return "pil" if pil_available() else "ppm"


def _pick_codec(codec: str):
    if codec == "pil" or (codec == "auto" and pil_available()):
        return _decode_pil
    if codec == "ppm":
        return _decode_ppm
    if codec in ("auto", "stub"):
        return lambda payload, kind: _decode_stub(payload)
    raise ValueError(f"unknown codec {codec!r} (expected stub|ppm|pil|auto)")


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
    re-encode on the executors. ``codec="ppm"``: real decode of binary
    PPM via the stdlib parser → numpy nearest-neighbor resample → PPM
    re-encode (the no-Pillow real tier). ``codec="stub"`` (default):
    the deterministic fake (payload truncated by area ratio) — the
    schema/meta handling is identical, which is the tested contract."""
    out_schema = MEDIA_SCHEMA
    use_pil = codec == "pil" or (codec == "auto" and pil_available())
    if codec not in ("stub", "ppm", "pil", "auto"):
        raise ValueError(f"unknown codec {codec!r} (expected stub|ppm|pil|auto)")

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

        def ppm_resize(row):
            import numpy as np

            meta = dict(row["meta"]) if row["meta"] is not None else {}
            if row["kind"] != "image":
                return row["payload"], meta
            w0, h0, pixels = _ppm_parse(row["payload"])
            arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h0, w0, 3)
            ys = (np.arange(height) * h0) // height
            xs = (np.arange(width) * w0) // width
            out = arr[ys][:, xs]
            meta.update({"width": width, "height": height, "format": "ppm"})
            return ppm_encode(width, height, out.tobytes()), meta

        def fake_resize(row):
            # STUB: a real resize decodes + rescales; the deterministic
            # fake truncates payload proportionally to the area ratio.
            meta = dict(row["meta"]) if row["meta"] is not None else {}
            old_area = (meta.get("width") or 1) * (meta.get("height") or 1)
            ratio = min(1.0, (width * height) / max(old_area, 1))
            n = max(1, int(len(row["payload"]) * ratio))
            meta.update({"width": width, "height": height})
            return row["payload"][:n], meta

        xform = (
            pil_resize if use_pil else ppm_resize if codec == "ppm" else fake_resize
        )
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


# ---------------------------------------------------------------------------
# Audio tier (r9): REAL RIFF/WAV encode → decode round-trip, pure
# stdlib (wave + struct) + numpy PCM vectorization — the first
# non-stub audio codec path. The synth writes genuine 16-bit mono PCM
# WAV containers; the analyzer re-parses them with the stdlib reader
# and extracts exact-integer features, so the oracle (which recomputes
# the features straight from the sample formula) proves the
# encode→container→decode cycle is lossless.
# ---------------------------------------------------------------------------
AUDIO_SAMPLE_RATE = 8000

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_sq", LongType()),
        StructField("peak_abs", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("max_frame_energy", LongType()),
    ]
)


def synth_wav_payloads(ids: DataFrame) -> DataFrame:
    """(media_id) → (media_id, payload): a real WAV container per id.

    Sample i of media m is the deterministic 16-bit integer
    ``((m*31 + i*17) % 65536) - 32768``; n_samples = 256 + (m % 128)*2.
    Executor-side via mapInPandas — payload bytes never touch the
    driver.
    """
    import io as _io
    import wave as _wave

    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for m in pdf["media_id"]:
                n = 256 + (int(m) % 128) * 2
                i = np.arange(n, dtype=np.int64)
                s = ((int(m) * 31 + i * 17) % 65536) - 32768
                buf = _io.BytesIO()
                with _wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(AUDIO_SAMPLE_RATE)
                    w.writeframes(s.astype("<i2").tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return ids.mapInPandas(
        synth,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def audio_features(media: DataFrame, frame: int = 64) -> DataFrame:
    """Exact-integer PCM features from WAV payloads: sample count and
    rate from the container header, energy (Σs²), peak |s|, zero
    crossings (sign(0) counts as positive), and the max energy over
    non-overlapping ``frame``-sample frames. All BIGINT — no float in
    the pipeline, so the SQL oracle hash-matches bit for bit."""
    import io as _io
    import wave as _wave

    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURES_SCHEMA}
            for m, payload in zip(pdf["media_id"], pdf["payload"]):
                with _wave.open(_io.BytesIO(bytes(payload)), "rb") as w:
                    rate = w.getframerate()
                    n = w.getnframes()
                    pcm = w.readframes(n)
                s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                neg = s < 0
                n_frames = n // frame
                fe = (
                    (s[: n_frames * frame] ** 2)
                    .reshape(n_frames, frame)
                    .sum(axis=1)
                    if n_frames
                    else np.zeros(1, dtype=np.int64)
                )
                out["media_id"].append(int(m))
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["sum_sq"].append(int((s * s).sum()))
                out["peak_abs"].append(int(np.abs(s).max()) if n else 0)
                out["zero_crossings"].append(
                    int((neg[:-1] != neg[1:]).sum())
                )
                out["max_frame_energy"].append(int(fe.max()))
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, AUDIO_FEATURES_SCHEMA)
