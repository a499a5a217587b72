"""Multimodal columns (driver extension; BASELINE.json north star).

Image/audio/video payloads are opaque `binary` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow batch shapes, partition
sizing, mapInPandas signatures — is real and tested; the actual media
decode is STUBBED (`decode_stub='fake'` produces deterministic features;
`'error'` raises NotImplementedError) because no image/audio libraries
exist in this container. Swapping the stub for PIL/torchaudio keeps every
schema and operator unchanged.

Scale notes: binary payloads dominate row width, so operators avoid
shuffling blobs — feature extraction projects blobs down to small vectors
*before* any join/groupBy; `maxPartitionBytes` governs scan parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes are
    a seeded function of media_id."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.repeat(F.concat(F.lit("blob:"), F.col("id").cast("string")), 32), "utf-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("id") % 100 + 1).cast("int").alias("n_frames"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )
    return rows


def extract_features(
    media: DataFrame, decode_stub: str = "fake", feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Output: (media_id, kind, features array<float>). The stub derives a
    deterministic pseudo-feature vector from the payload bytes; a real
    deployment replaces `_decode` only.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _decode(payload: bytes, kind: str) -> list[float]:
        if decode_stub == "error":
            raise NotImplementedError(
                "media decode requires image/audio libraries not present in "
                "this container; install and replace _decode"
            )
        # deterministic fake: roll payload bytes into feature_dim buckets
        acc = [0] * feature_dim
        for i, b in enumerate(payload or b""):
            acc[i % feature_dim] = (acc[i % feature_dim] + b) % 997
        return [float(x) / 997.0 for x in acc]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [
                        _decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: filters to images, rewrites meta, stubs the
    pixel transform (payload passthrough + meta update)."""
    imgs = media.filter(F.col("kind") == "image")
    return imgs.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.format").alias("format"),
        ),
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index (explode over the frame grid; decode stays stubbed)."""
    vids = media.filter(F.col("kind") == "video")
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return vids.select(
        "media_id",
        F.explode(frames).alias("frame_idx"),
        "meta",
    )
