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
    """Real image decode behind an import guard: uses PIL when the
    deployment installs it (`pip install pillow`), raises with a clear
    message here (PIL/libjpeg are not in this container). The calling
    plumbing (schema, batching, partition sizing) is identical either
    way — swapping the kernel is a one-line change in the deployer's
    ``with_media_features`` wrapper."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - PIL absent in CI image
        raise NotImplementedError(
            "PIL/libjpeg not available in this image — install pillow "
            "to enable real image decode"
        ) from e
    return Image.open(io.BytesIO(payload))  # pragma: no cover


def image_features(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Feature kernel with the real-codec path preferred: PIL decode →
    grayscale thumbnail → normalized pixel moments when pillow is
    installed; the deterministic fake otherwise (this container)."""
    if payload is None:
        return [0.0] * dim
    try:
        img = decode_image(payload)
    except Exception:  # noqa: BLE001 - codec absent OR corrupt payload
        return fake_decode_features(payload, dim)
    arr = np.asarray(  # pragma: no cover - PIL absent in CI image
        img.convert("L").resize((4, 4))
    ).astype("float64").ravel()
    return [  # pragma: no cover
        float(x) for x in np.round(arr / 255.0, 6)[:dim]
    ] + [0.0] * max(0, dim - arr.size)


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


def generate_media(spark, n: int = 100, seed: int = 7, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table for tests.

    ``partitions`` bounds the Python-worker fan-out: a tiny row count
    split over 32 partitions pays 32× worker/Arrow spin-up for no
    parallelism gain (the round-1 bench anomaly — 38 s for 200 rows)."""

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

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def media_from_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Derive a deterministic media table from a documents table — the
    oracle-friendly synthetic source: every column is a pure JVM
    expression of sha2(text)/doc_id, so a DuckDB twin can reproduce the
    table (and everything computed from it) bit-for-bit.

    payload = unhex(repeat(sha256-hex, 1 + doc_id % 3)) — a binary
    column whose first 8 bytes are the first 16 hex chars of the digest;
    kind cycles image/audio/video; duration only for audio/video.
    """
    sha = F.sha2(F.col(text_col), 256)
    head60 = F.conv(F.substring(sha, 1, 15), 16, 10).cast("long")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    copies = (F.col(id_col) % 3 + 1).cast("int")
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.unhex(F.repeat(sha, copies)).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.when(kind == "image", (head60 % 192 + 64).cast("int")).alias("width"),
        F.when(kind == "image", (head60 % 128 + 64).cast("int")).alias("height"),
        F.when(
            kind != "image", (head60 % 4000 + 1000).cast("int")
        ).alias("duration_ms"),
    )


_FEATURE_FIELDS = [
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("head60", T.LongType(), True),
]


def extract_media_features(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Deterministic feature extraction over the binary payload via
    iterator ``mapInPandas`` (one worker init per partition,
    Arrow-batched transfer) — the decode kernel is a byte-level
    fingerprint (real codecs would slot in here; see
    :func:`decode_image`): ``n_bytes`` = payload length, ``head60`` =
    first-8-bytes big-endian int >> 4 (== the first 15 hex chars of the
    payload, reproducible in SQL when the payload is hex-derived)."""
    out_schema = T.StructType(df.schema.fields + _FEATURE_FIELDS)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-worker init (codec/model load) happens once, here
        for pdf in batches:
            pdf = pdf.copy()
            payloads = pdf[payload_col]
            pdf["n_bytes"] = pd.array(
                [None if p is None else len(p) for p in payloads], dtype="Int32"
            )
            pdf["head60"] = pd.array(
                [
                    None
                    if p is None or len(p) < 8
                    else int.from_bytes(p[:8], "big") >> 4
                    for p in payloads
                ],
                dtype="Int64",
            )
            yield pdf

    return df.mapInPandas(extract, out_schema)
