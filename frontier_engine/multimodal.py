"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Driver mandate: the Spark-side plumbing (schema, partitioning, UDF
signature, Arrow batch shape) is REAL and tested; the codec step is a
clearly-marked stub because this container ships no image/audio libraries
(no PIL/cv2/ffmpeg — verified).  Swapping ``_decode_image_stub`` for a PIL
call is the only production change.

Reference lineage: the reference downloads media bytes into memory and
content-addresses them (media_downloader.py:173-188) and reads image
dimensions via PIL (media_downloader.py:194-200, E19) — these operators are
the distributed version of that path.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("url", StringType(), True),
        StructField("media_type", StringType(), False),  # images|videos|audio
        StructField("content_type", StringType(), True),
        StructField("content", BinaryType(), True),  # opaque bytes
        StructField("size", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content_hash", StringType(), True),  # E17 md5[:10]
        StructField("width", IntegerType(), True),  # E19 analogue
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("feature", BinaryType(), True),  # packed float32 vector
    ]
)

FEATURE_DIM = 16


class CodecUnavailable(NotImplementedError):
    """Raised when a real codec would be needed but none is installed."""


def _decode_image_stub(content: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode — deterministic fake in place of PIL.Image.open.

    Real implementation: ``img = PIL.Image.open(io.BytesIO(content));
    return img.width, img.height, np.asarray(img)`` (E19,
    media_downloader.py:194-200).  The fake derives (w, h) and a pixel
    summary from a blake2b digest of the bytes so tests get stable,
    content-dependent values with the same shapes as the real path.
    """
    d = hashlib.blake2b(content, digest_size=32).digest()
    w = 16 + d[0] % 240
    h = 16 + d[1] % 240
    pixels = np.frombuffer(d, dtype=np.uint8).astype(np.float32)
    return w, h, pixels


def _feature_vector(pixels: np.ndarray) -> np.ndarray:
    """Feature-extract stub: fixed-length float32 summary (real path: a
    model forward pass).  Deterministic, vectorized."""
    reps = int(np.ceil(FEATURE_DIM / len(pixels))) if len(pixels) else 1
    base = np.tile(pixels, max(reps, 1))[:FEATURE_DIM]
    norm = np.linalg.norm(base) or 1.0
    return (base / norm).astype(np.float32)


def extract_media_features(media: DataFrame, batch_partitions: int | None = None) -> DataFrame:
    """Decode + feature-extract media binaries via ``mapInPandas``.

    Scale shape: binary payloads never hit the driver; each Arrow batch
    carries ``content`` as zero-copy buffers into the Python worker; output
    drops the raw bytes (carry only the 64-byte feature + scalars) so the
    downstream shuffle moves KB not MB per row — the same
    project-early-drop-payload discipline as the crawl loop.
    """
    src = media.repartition(batch_partitions) if batch_partitions else media

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "content_hash", "width", "height", "n_frames", "feature")}
            for mid, mtype, content in zip(pdf["media_id"], pdf["media_type"], pdf["content"]):
                out["media_id"].append(mid)
                if content is None:
                    for k in ("content_hash", "width", "height", "n_frames", "feature"):
                        out[k].append(None)
                    continue
                content = bytes(content)
                out["content_hash"].append(hashlib.md5(content).hexdigest()[:10])
                if mtype == "images":
                    w, h, px = _decode_image_stub(content)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(1)
                    out["feature"].append(_feature_vector(px).tobytes())
                elif mtype == "videos":
                    # frame-sample stub: every "frame" is a content slice
                    frames = max(1, len(content) // 64)
                    w, h, px = _decode_image_stub(content[:64])
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(min(frames, 32))
                    out["feature"].append(_feature_vector(px).tobytes())
                elif mtype == "audio":
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_frames"].append(max(1, len(content) // 128))
                    px = np.frombuffer(hashlib.blake2b(content, digest_size=32).digest(), dtype=np.uint8).astype(np.float32)
                    out["feature"].append(_feature_vector(px).tobytes())
                else:
                    for k in ("width", "height", "n_frames", "feature"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=FEATURES_SCHEMA)


def unpack_feature_col(df: DataFrame, col: str = "feature") -> DataFrame:
    """Packed float32 bytes → array<float> (for ANN ops downstream):
    one native transform over the binary — no Python."""
    n = FEATURE_DIM

    @F.pandas_udf("array<float>")
    def unpack(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: list(struct.unpack(f"<{n}f", b)) if b is not None else None,
            na_action="ignore",
        )

    return df.withColumn(col + "_vec", unpack(F.col(col)))


def media_dedup(features: DataFrame) -> DataFrame:
    """Content-level dedup on the media hash — exactly the reference's
    md5[:10] file-collapse semantics (media_downloader.py:181-188)."""
    return features.groupBy("content_hash").agg(
        F.min("media_id").alias("keep_media_id"), F.count(F.lit(1)).alias("dup_count")
    )


def gen_media(n: int, seed: int = 42) -> list[dict]:
    """Deterministic synthetic media table (no real codecs needed)."""
    rows = []
    for i in range(n):
        mtype = ("images", "videos", "audio")[i % 3]
        group = i % max(1, n - n // 10)  # last ~10% of ids duplicate content
        size = 64 + (group * 37) % 4000  # size derives from the group so
        content = hashlib.blake2b(f"media{group}".encode(), digest_size=32).digest() * (
            size // 32 + 1
        )  # duplicates are byte-identical
        rows.append(
            {
                "media_id": i,
                "url": f"https://cdn.example.net/m/{i % max(1, n - n // 10)}.bin",
                "media_type": mtype,
                "content_type": {"images": "image/png", "videos": "video/mp4", "audio": "audio/mpeg"}[mtype],
                "content": content[:size],
                "size": size,
            }
        )
    return rows
