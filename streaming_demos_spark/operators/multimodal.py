"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct; the
heavy per-item work (decode, resize, feature-extract, frame-sample)
runs as Arrow-batched ``mapInPandas`` so each Python worker touches a
columnar batch of blobs, never a row at a time.

The decode kernels themselves are STUBBED in this container (no
image/audio libraries baked in): ``decoder="fake"`` produces
deterministic features from the raw bytes (length + md5 + first/last
byte), so the Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is fully real and testable; ``decoder="pil"`` etc.
raise NotImplementedError until the real library is importable.

Scale notes: blobs ride the scan as parquet binary; feature extraction
is map-only (no shuffle); ``spark.sql.files.maxPartitionBytes`` bounds
the per-task blob volume, and wide blobs should be stored in a
separate parquet column-family-style table keyed by content hash so
text-only queries never read them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Media row: opaque payload + typed metadata.
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video|blob
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StructType(
            [
                T.StructField("mime", T.StringType(), True),
                T.StructField("n_bytes", T.LongType(), True),
            ]
        ), True),
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("head_byte", T.IntegerType(), True),
        T.StructField("tail_byte", T.IntegerType(), True),
    ]
)


def as_media(
    df: DataFrame, id_col: str, payload_col: str, kind: str = "blob", mime: str = "application/octet-stream"
) -> DataFrame:
    """Wrap any binary (or string, cast to UTF-8 bytes) column as a
    MEDIA-shaped frame. Strings are encoded JVM-side."""
    payload = F.col(payload_col)
    payload = payload.cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"), F.length(payload).cast("long").alias("n_bytes")
        ).alias("meta"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a real decoder: features derived only
    from the raw bytes, so any engine (or oracle) can recompute them."""
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
            "digest": payloads.map(
                lambda b: hashlib.md5(b).hexdigest() if b is not None else None
            ),
            "head_byte": payloads.map(lambda b: b[0] if b else None),
            "tail_byte": payloads.map(lambda b: b[-1] if b else None),
        }
    )


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Per-item feature extraction over Arrow batches (mapInPandas).

    ``fake``: deterministic byte-level features (real plumbing, stub
    kernel). Any other decoder name requires its library at runtime.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r} requires media libraries not present in "
            "this container; only the deterministic 'fake' decoder runs here"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(run, schema=MEDIA_FEATURES)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — requires an image library (PIL/opencv), absent in
    this container. The mapInPandas plumbing is identical to
    extract_features; only the kernel differs."""
    raise NotImplementedError(
        "image decode/resize needs PIL or opencv, not baked into this "
        "container; the batch plumbing is exercised via extract_features"
    )


def sample_frames(media: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling — requires a video library (pyav/ffmpeg),
    absent in this container."""
    raise NotImplementedError(
        "video decode needs pyav/ffmpeg, not baked into this container; "
        "the batch plumbing is exercised via extract_features"
    )
