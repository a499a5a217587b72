"""Multimodal columns (driver extension; BASELINE.json north star).

Image/audio/video payloads are opaque `binary` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow batch shapes, partition
sizing, mapInPandas signatures — is real and tested. Decode modes:

  - ``decode_stub='real'`` — REAL byte-level decode using only the stdlib:
    P6 PPM pixel data for images (netpbm spec), RIFF/WAVE PCM16 via the
    stdlib ``wave`` module for audio, and a trivial length-prefixed
    PPM-frame container for video. No third-party media library needed;
    swapping in PIL/torchaudio for richer formats replaces only
    ``_decode_real``'s parsers, never a schema or operator.
  - ``decode_stub='fake'`` — deterministic pseudo-features from raw bytes
    (any payload, no format requirement).
  - ``decode_stub='error'`` — raises, for pipelines that must fail loudly
    on undecodable media.

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

#: real-payload generation constants (small on purpose — payload width is
#: the scale knob, the formats are what matter)
_IMG_W, _IMG_H = 16, 16
_WAV_SR, _WAV_N = 16000, 2048
_VID_W, _VID_H = 8, 8
_VID_MAGIC = b"VID0"


def _make_ppm(seed: int, w: int = _IMG_W, h: int = _IMG_H) -> bytes:
    """Deterministic binary P6 PPM: header + w*h*3 raw pixel bytes."""
    import numpy as np

    header = f"P6\n{w} {h}\n255\n".encode()
    idx = np.arange(w * h * 3, dtype="int64")
    px = ((seed * 31 + idx * 7) % 256).astype(np.uint8)
    return header + px.tobytes()


def _make_wav(seed: int, sr: int = _WAV_SR, n: int = _WAV_N) -> bytes:
    """Deterministic RIFF/WAVE, PCM16 mono, via the stdlib wave writer."""
    import io
    import wave

    import numpy as np

    samples = (((seed * 131 + np.arange(n, dtype="int64") * 17) % 65536) - 32768).astype(
        "<i2"
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def _make_vid(seed: int, n_frames: int) -> bytes:
    """Trivial video container: magic + uint32 frame count + PPM frames."""
    import struct

    frames = b"".join(
        _make_ppm(seed * 1009 + f, _VID_W, _VID_H) for f in range(n_frames)
    )
    return _VID_MAGIC + struct.pack("<I", n_frames) + frames


def _parse_ppm(b: bytes):
    """P6 PPM → (h, w, 3) uint8 ndarray; returns (array, bytes_consumed)."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
    if not m:
        raise ValueError("payload is not a binary (P6) PPM")
    w, h = int(m.group(1)), int(m.group(2))
    end = m.end() + w * h * 3
    data = b[m.end() : end]
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3), end


def _parse_wav(b: bytes):
    """RIFF/WAVE PCM16 → (sample_rate, int16 ndarray) via stdlib wave."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(b)) as wf:
        sr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    return sr, np.frombuffer(raw, dtype="<i2")


def _parse_vid(b: bytes):
    """VID0 container → list of (h, w, 3) uint8 frames."""
    import struct

    if b[:4] != _VID_MAGIC:
        raise ValueError("payload is not a VID0 frame container")
    (n_frames,) = struct.unpack("<I", b[4:8])
    off, frames = 8, []
    for _ in range(n_frames):
        arr, used = _parse_ppm(b[off:])
        frames.append(arr)
        off += used
    return frames


def _bucket_means(x, feature_dim: int) -> list[float]:
    """Split a 1-D signal into feature_dim contiguous chunks, mean each —
    a deterministic fixed-width summary of arbitrary-length media."""
    import numpy as np

    if len(x) == 0:
        return [0.0] * feature_dim
    return [
        float(c.mean()) if len(c) else 0.0
        for c in np.array_split(np.asarray(x, dtype="float64"), feature_dim)
    ]


def _decode_real(payload: bytes, kind: str, feature_dim: int) -> list[float]:
    """Stdlib-only decode → fixed-width features from ACTUAL samples:
    image = bucketed grayscale pixel means (/255), audio = bucketed |PCM16|
    means (/32768), video = bucketed per-frame grayscale means."""
    import numpy as np

    if kind == "image":
        arr, _ = _parse_ppm(payload)
        gray = arr.astype("float64").mean(axis=2).reshape(-1) / 255.0
        return _bucket_means(gray, feature_dim)
    if kind == "audio":
        _, samples = _parse_wav(payload)
        return _bucket_means(np.abs(samples.astype("float64")) / 32768.0, feature_dim)
    if kind == "video":
        frames = _parse_vid(payload)
        means = [f.astype("float64").mean() / 255.0 for f in frames]
        return _bucket_means(means, feature_dim)
    raise ValueError(f"unknown media kind: {kind!r}")


def synthetic_media(spark, n: int = 64, real_payloads: bool = False) -> DataFrame:
    """Deterministic media table. ``real_payloads=False``: cheap fake blobs
    (expression-level) for plumbing tests. ``real_payloads=True``: actual
    P6 PPM / RIFF WAV / VID0 bytes generated EXECUTOR-SIDE in an Arrow
    stage (seeded by media_id — no driver data, scales with partitions)."""
    if not real_payloads:
        return spark.range(n).select(
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

    kinds = ["image", "audio", "video"]
    fmts = {"image": "ppm", "audio": "wav", "video": "vid0"}

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for mid in pdf["id"]:
                mid = int(mid)
                kind = kinds[mid % 3]
                nf = mid % 5 + 1
                if kind == "image":
                    payload = _make_ppm(mid)
                elif kind == "audio":
                    payload = _make_wav(mid)
                else:
                    payload = _make_vid(mid, nf)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["payload"].append(payload)
                out["meta"].append(
                    {
                        "width": _IMG_W if kind == "image" else _VID_W,
                        "height": _IMG_H if kind == "image" else _VID_H,
                        "sample_rate": _WAV_SR,
                        "n_frames": nf if kind == "video" else 1,
                        "format": fmts[kind],
                    }
                )
            yield pd.DataFrame(out)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


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
                "decode_stub='error': refusing to decode; use 'real' "
                "(stdlib PPM/WAV/VID0) or 'fake' (byte-roll pseudo-features)"
            )
        if decode_stub == "real":
            return _decode_real(payload, kind, feature_dim)
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
