"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

No reference equivalent (extension surface per BASELINE.json). The Spark
plumbing here — schemas, binaryFile ingestion, Arrow-batched decode UDFs,
partition sizing — is real and tested. Decoders are import-gated (same
pattern as the SFTP/SQS environment stubs): AUDIO decode is REAL (stdlib
``wave`` PCM parser — RMS envelope features + header metadata); IMAGE
decode is real via PIL when importable, else the loudly-marked
deterministic fake (``_fake_decode``, derives features from the payload
hash) stands in so the pipeline shape stays testable in this container.

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


# -- real decoders, import-gated (same pattern as SFTP/SQS stubs) -----------


def _pil_image():  # pragma: no cover - depends on environment
    """PIL import gate: returns the Image module or None."""
    try:
        from PIL import Image  # type: ignore[import-not-found]

        return Image
    except ImportError:
        return None


def decode_image_real(content: bytes, dim: int) -> list[float]:
    """REAL image decode via PIL when importable: decode → grayscale →
    resize to a √dim×√dim grid → normalized pixel vector. Raises
    ImportError when PIL is absent (callers fall back to the fake)."""
    Image = _pil_image()
    if Image is None:
        raise ImportError("PIL not available")
    import io
    import math

    side = max(1, int(math.isqrt(dim)))
    img = Image.open(io.BytesIO(content)).convert("L").resize((side, side))
    px = list(img.getdata())
    vals = [p / 255.0 for p in px]
    # pad/trim to exactly dim
    vals = (vals * ((dim // max(1, len(vals))) + 1))[:dim]
    return vals


def decode_wav_real(content: bytes, dim: int) -> list[float]:
    """REAL audio decode for WAV payloads using only the stdlib ``wave``
    module (always available): parse PCM frames and return a ``dim``-bucket
    RMS envelope normalized to [0, 1]. Raises on non-WAV payloads (callers
    treat that as a decode error-as-record)."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        raw = w.readframes(n)
    if sw == 2:
        samples = struct.unpack(f"<{len(raw) // 2}h", raw)
        full = 32768.0
    elif sw == 1:
        samples = [b - 128 for b in raw]
        full = 128.0
    else:  # 24/32-bit: decode via 4-byte little-endian chunks
        step = sw
        samples = [
            int.from_bytes(raw[i : i + step], "little", signed=True)
            for i in range(0, len(raw) - step + 1, step)
        ]
        full = float(1 << (8 * sw - 1))
    # mixdown: average interleaved channels
    if ch > 1:
        samples = [
            sum(samples[i : i + ch]) / ch for i in range(0, len(samples) - ch + 1, ch)
        ]
    if not samples:
        return [0.0] * dim
    bucket = max(1, len(samples) // dim)
    vals = []
    for b in range(dim):
        chunk = samples[b * bucket : (b + 1) * bucket]
        if not chunk:
            vals.append(0.0)
            continue
        rms = (sum(s * s for s in chunk) / len(chunk)) ** 0.5
        vals.append(min(1.0, rms / full))
    return vals


def wav_metadata(content: bytes) -> dict[str, int]:
    """Parse WAV header → {sample_rate, channels, duration_ms, sample_width}
    with the stdlib only. Real, not a stub."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        return {
            "sample_rate": rate,
            "channels": w.getnchannels(),
            "sample_width": w.getsampwidth(),
            "duration_ms": int(n * 1000 / rate) if rate else 0,
        }


def decode_bmp_real(content: bytes, dim: int) -> list[float]:
    """REAL image decode for uncompressed 24/32-bit BMP using ONLY the
    stdlib (``struct``): parse the BITMAPFILEHEADER/BITMAPINFOHEADER,
    walk the (bottom-up, 4-byte-padded) pixel rows, and return a
    ``dim``-bucket mean-brightness profile over horizontal bands,
    normalized to [0, 1]. Raises on non-BMP / compressed payloads
    (callers treat that as a decode error-as-record). BMP is the one
    mainstream raster format fully decodable without external libs —
    the same de-stubbing move the stdlib ``wave`` parser makes for
    audio."""
    import struct

    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    px_off = struct.unpack_from("<I", content, 10)[0]
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flipped = height > 0  # positive height ⇒ rows stored bottom-up
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    step = bpp // 8
    stride = ((width * step + 3) // 4) * 4
    # mean brightness per pixel row (b, g, r byte order)
    row_means = []
    for r in range(height):
        src = r if not flipped else height - 1 - r
        base = px_off + src * stride
        if base + width * step > len(content):
            raise ValueError("truncated BMP pixel data")
        tot = 0
        for c in range(width):
            i = base + c * step
            tot += content[i] + content[i + 1] + content[i + 2]
        row_means.append(tot / (3.0 * 255.0 * width))
    # collapse rows into dim horizontal bands
    bucket = max(1, len(row_means) // dim)
    vals = []
    for b in range(dim):
        chunk = row_means[b * bucket : (b + 1) * bucket]
        vals.append(sum(chunk) / len(chunk) if chunk else 0.0)
    return vals


def decode_media(content: bytes, modality: str, dim: int) -> list[float]:
    """Dispatch to the best available decoder: real WAV parser for audio,
    PIL (when importable) for images, deterministic fake otherwise. The
    fake is the documented fallback, not the default at any site where a
    real decoder can run."""
    # MIME-style prefixes ("audio/wav", "image/png") and bare labels both
    # dispatch — a real decoder must never be skipped over a spelling
    if modality.startswith("audio"):
        return decode_wav_real(content, dim)  # stdlib — always real
    if modality.startswith("image"):
        if _pil_image() is not None:
            return decode_image_real(content, dim)
        if content[:2] == b"BM":
            return decode_bmp_real(content, dim)  # stdlib — always real
    return _fake_decode(content, dim)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    content_col: str = "content",
    modality_col: str | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    The mapInPandas shape (batch iterator → batch iterator) is the
    production plumbing: decoding happens executor-side per Arrow batch,
    bounded memory, no row-at-a-time Python overhead. When
    ``modality_col`` is given, each row dispatches through
    :func:`decode_media` — audio rows get the REAL stdlib WAV decoder,
    image rows the real PIL path when PIL is importable; otherwise rows
    fall back to the loudly-marked deterministic fake. Decode failures
    are error-as-record (``decode_ok``), never job failures."""
    import pandas as pd

    id_col = "media_id" if "media_id" in df.columns else None
    if id_col is None:
        df = df.withColumn("media_id", F.monotonically_increasing_id())

    cols = ["media_id", content_col] + ([modality_col] if modality_col else [])
    src = df.select(*cols)

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats, oks = [], []
            modalities = (
                pdf[modality_col] if modality_col else [None] * len(pdf)
            )
            for content, modality in zip(pdf[content_col], modalities):
                raw = bytes(content) if content is not None else b""
                try:
                    if modality is not None:
                        feats.append(decode_media(raw, modality, dim))
                    else:
                        feats.append(_fake_decode(raw, dim))
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
