"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lake as ``binary`` columns with a
typed metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages. ``real_decode`` carries EXECUTABLE pure-Python
kernels for the container-parseable formats (RIFF/WAV PCM audio, binary
PPM images — header + sample parse, numpy-vectorized, no codec
dependency); ``fake_decode`` remains the deterministic byte-histogram
stand-in tests use when payload contents don't matter. Formats that
genuinely need codec libraries (JPEG/MP4/...) raise ``ValueError``
naming the mime — swap a codec-backed decoder in via the
``extract_features(decoder=...)`` seam in environments that have them.

Scale: mapInPandas streams Arrow record batches per partition — memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
partition size; payloads never pass through the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE PCM parse -> 8 floats: [n_channels, sample_rate/48k,
    duration_s, rms, mean, peak, zero-crossing rate, log10(n_samples+1)].
    Pure header+sample parse (struct offsets per the public RIFF spec),
    16-bit and 8-bit PCM; anything else raises ValueError."""
    if len(payload) < 44 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16) or n_channels < 1:
        raise ValueError(f"unsupported WAVE encoding (format={audio_format}, bits={bits})")
    if bits == 16:
        x = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
        x = x.astype(np.float32) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if x.size == 0:
        raise ValueError("WAVE payload has no samples")
    n_frames = x.size // n_channels
    mono = x[: n_frames * n_channels].reshape(n_frames, n_channels).mean(axis=1)
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if mono.size > 1 else 0.0
    return np.array(
        [
            float(n_channels),
            sample_rate / 48000.0,
            n_frames / float(sample_rate),
            float(np.sqrt(np.mean(mono**2))),
            float(np.mean(mono)),
            float(np.max(np.abs(mono))),
            zcr,
            float(np.log10(n_frames + 1.0)),
        ],
        dtype=np.float32,
    )


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) parse -> 8 floats: [width, height, aspect,
    mean_r, mean_g, mean_b (maxval-normalized), luma_mean, luma_std].
    Header tokens per the netpbm spec (whitespace-separated, ``#``
    comments); maxval <= 255 rasters only."""
    if payload[0:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = tokens
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (w={w}, h={h}, maxval={maxval})")
    pos += 1  # single whitespace after maxval, then the raster
    raster = np.frombuffer(payload[pos : pos + w * h * 3], dtype=np.uint8)
    if raster.size != w * h * 3:
        raise ValueError("truncated PPM raster")
    px = raster.reshape(h, w, 3).astype(np.float32) / float(maxval)
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return np.array(
        [
            float(w),
            float(h),
            w / float(h),
            float(px[:, :, 0].mean()),
            float(px[:, :, 1].mean()),
            float(px[:, :, 2].mean()),
            float(luma.mean()),
            float(luma.std()),
        ],
        dtype=np.float32,
    )


_DECODERS = {
    "audio/wav": _decode_wav,
    "audio/x-wav": _decode_wav,
    "audio/wave": _decode_wav,
    "image/x-portable-pixmap": _decode_ppm,
    "image/ppm": _decode_ppm,
}


def real_decode(payload: bytes, mime: str | None = None) -> np.ndarray:
    """Decode real bytes into an 8-float feature vector. WAV and PPM are
    parsed natively (no codec dependency); other mimes raise ValueError
    naming the format — plug a codec-backed decoder into
    ``extract_features(decoder=...)`` where those libraries exist."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    decoder = _DECODERS.get((mime or "").lower())
    if decoder is None:
        raise ValueError(
            f"no native decoder for mime {mime!r} (supported: {sorted(_DECODERS)}); "
            "supply a codec-backed decoder via extract_features(decoder=...)"
        )
    return decoder(payload)


def fake_decode(payload: bytes, mime: str | None = None) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes -> fixed-length float
    histogram. Vectorizable, seedless, stable across runs — for tests
    where payload CONTENT doesn't matter, only the Spark-side plumbing."""
    if payload is None or len(payload) == 0:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    return (hist / max(len(arr), 1)).astype(np.float32)


def extract_features(media: DataFrame, decoder=fake_decode) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. The
    decoder is called per row as ``decoder(payload, mime)`` inside the
    Arrow batch loop — numpy work on executor-local batches, payloads
    never crossing the driver."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decoder(p, m).tolist()
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def generate_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic binary fixtures (payload derived from id — no RNG)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), 3) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("payload-"), F.col("id").cast("string"), F.repeat(F.lit("\x01\x7f"), (F.pmod(F.col("id"), 32) + 1).cast("int"))),
        "utf-8",
    ).cast("binary")
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(1000).cast("int").alias("duration_ms"),
    )
