"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

No reference equivalent (extension surface per BASELINE.json). The Spark
plumbing here — schemas, binaryFile ingestion, Arrow-batched decode UDFs,
partition sizing — is real and tested; the actual media decoding is STUBBED
(image/audio libraries are not in this container) behind
``decode_image_stub``: a deterministic fake that derives "pixels"/features
from the bytes' hash, clearly marked, swappable for a real decoder.

Scale notes: binary payloads dominate partition size — size partitions by
bytes not rows (maxPartitionBytes), keep metadata in separate narrow
columns so metadata-only queries never touch the blobs (parquet column
pruning does this for free), and never collect() blobs to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# engine-standard multimodal schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("path", StringType(), True),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("content_length", LongType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decode_ok", StringType(), True),
    ]
)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Ingest raw media files as (path, modificationTime, length, content)
    via the built-in binaryFile source — distributed, no driver listing."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def _fake_decode(content: bytes, dim: int) -> list[float]:
    """DETERMINISTIC FAKE decoder: derives a feature vector from the sha256
    of the payload. Stands in for image/audio decode (libs unavailable
    here); replace with PIL/librosa in production. Marked loudly on purpose."""
    h = hashlib.sha256(content or b"").digest()
    # repeat the 32-byte digest to fill dim floats in [0, 1)
    vals = [(h[i % 32]) / 256.0 for i in range(dim)]
    return vals


def extract_features(df: DataFrame, dim: int = 16, content_col: str = "content") -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    The mapInPandas shape (batch iterator → batch iterator) is the real
    production plumbing: decoding happens executor-side per Arrow batch,
    bounded memory, no row-at-a-time Python overhead. Only the inner decode
    call is a stub."""
    import pandas as pd

    id_col = "media_id" if "media_id" in df.columns else None
    if id_col is None:
        df = df.withColumn("media_id", F.monotonically_increasing_id())

    src = df.select("media_id", content_col)

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats, oks = [], []
            for content in pdf[content_col]:
                try:
                    feats.append(_fake_decode(bytes(content) if content is not None else b"", dim))
                    oks.append("ok")
                except Exception as e:  # noqa: BLE001 — error-as-record
                    feats.append(None)
                    oks.append(f"error: {e}")
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "decode_ok": oks}
            )

    return src.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: passes payloads through an Arrow-batched stage
    that would call the real resizer. NotImplemented decode is replaced by
    a byte-truncation fake so the pipeline shape is testable."""
    import pandas as pd

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("content", BinaryType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # FAKE: real impl decodes + resizes; fake keeps a
                    # deterministic prefix proportional to target area
                    "content": [
                        bytes(c)[: max(1, (width * height) // 64)] if c is not None else None
                        for c in pdf["content"]
                    ],
                    "width": width,
                    "height": height,
                }
            )
            yield out

    return df.select("media_id", "content").mapInPandas(_batches, schema=schema)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: 1:N explode of a payload into frame
    rows (timestamps every ``every_ms``). Frame extraction itself is faked
    as sliced bytes; the explode/partitioning shape is the real design."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
        ),
        lambda i: F.struct(
            (i * every_ms).cast("long").alias("frame_ts_ms"),
            # FAKE frame payload: deterministic slice keyed by index
            F.substring(F.base64("content"), 1, 32).alias("frame_stub"),
        ),
    )
    return df.select(
        "media_id", F.explode(frames).alias("f")
    ).select("media_id", "f.frame_ts_ms", "f.frame_stub")
