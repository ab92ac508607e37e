"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature kernels need codec libraries (PIL/ffmpeg/torchaudio)
that are NOT in this container — the decode step is stubbed behind a
deterministic fake (or ``NotImplementedError`` for real codecs), while
the Spark-side plumbing is real and tested: schema, Arrow batch shape,
``mapInPandas`` iterator signature, partition sizing.

At scale the rules encoded here:
- binary payloads ride in their own column so Parquet keeps them in
  separate pages and column pruning skips them when untouched;
- decode runs in ``mapInPandas`` (iterator form) so one Python worker
  amortizes model/codec init across batches;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory —
  for multi-MB payloads callers should repartition so a batch of rows
  fits comfortably in the Python worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def fake_decode_features(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: derives a
    ``dim``-float vector from the payload bytes via a seeded hash. Real
    codecs would go here (PIL decode / resize / frame-sample); they are
    not installed in this image."""
    if payload is None:
        return [0.0] * dim
    seed = int.from_bytes(__import__("hashlib").sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.standard_normal(dim).round(6)]


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires PIL, not present in this container."""
    raise NotImplementedError("PIL/libjpeg not available in this image")


def with_media_features(
    df: DataFrame, payload_col: str = "payload", out_col: str = "features"
) -> DataFrame:
    """Add a feature vector per media row via iterator ``mapInPandas``
    (one worker init per partition, Arrow-batched transfer)."""
    out_fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.FloatType()), True)
    ]
    out_schema = T.StructType(out_fields)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-worker init (codec/model load) happens once, here
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[payload_col].map(fake_decode_features)
            yield pdf

    return df.mapInPandas(extract, out_schema)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, duration_col: str = "duration_ms"
) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode one row per frame
    timestamp (the decode of each frame stays stubbed). JVM-side
    ``sequence`` — no Python."""
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col(duration_col), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return df.withColumn("frame_ms", F.explode(ts))


def generate_media(spark, n: int = 100, seed: int = 7) -> DataFrame:
    """Deterministic synthetic media table for tests."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": [kinds[i % 3] for i in ids],
                    "payload": [
                        bytes(f"media-{seed}-{i}", "utf-8") * (1 + i % 5)
                        for i in ids
                    ],
                    "mime": ["application/octet-stream"] * len(ids),
                    "width": pd.array(
                        [64 + (i % 4) * 32 if i % 3 == 0 else None for i in ids],
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        [64 if i % 3 == 0 else None for i in ids], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [2000 + 500 * (i % 3) if i % 3 != 0 else None for i in ids],
                        dtype="Int32",
                    ),
                }
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
