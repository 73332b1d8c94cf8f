"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lake as ``binary`` columns with a
typed metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages. The decode kernels themselves are STUBBED (the
image/audio libraries are not in this container) behind
``DecoderUnavailable`` with a deterministic fake implementation used by
tests — the Spark-side contract (schema, batch iteration, partitioning,
output shape) is real and tested.

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


class DecoderUnavailable(NotImplementedError):
    """Raised by the real decode path: codec libs are not installed here."""


def real_decode(payload: bytes, mime: str) -> np.ndarray:  # pragma: no cover
    raise DecoderUnavailable(
        "image/audio codecs are not available in this environment; "
        "use fake_decode (deterministic) or install codecs in production"
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes -> fixed-length float
    histogram. Vectorizable, seedless, stable across runs."""
    if payload is None or len(payload) == 0:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    return (hist / max(len(arr), 1)).astype(np.float32)


def extract_features(media: DataFrame, decoder=fake_decode) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decoder(p).tolist() for p in pdf["payload"]]
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
