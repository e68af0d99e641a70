"""Video near-duplicate detection (operators/multimodal.py::frame_ahash
/ video_near_dup): in-plan frame hashing, frame-aligned banded matching."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.multimodal import frame_ahash, video_near_dup


def test_frame_ahash_known_grid(spark):
    # 2x2 grid: [10, 200, 10, 200] mean=105 -> bits 0101 -> hex '5'
    df = spark.createDataFrame(
        [(1, 0, [[10.0, 200.0], [10.0, 200.0]])],
        "media_id long, frame_idx int, pixels array<array<double>>",
    )
    out = frame_ahash(df, grid=(2, 2)).collect()[0]
    assert out["fhash"] == "5"


def test_frame_ahash_uniform_frame_is_zero(spark):
    # uniform frame: nothing strictly above the mean -> all-zero hash
    df = spark.createDataFrame(
        [(1, 0, [[7.0, 7.0], [7.0, 7.0]])],
        "media_id long, frame_idx int, pixels array<array<double>>",
    )
    assert frame_ahash(df, grid=(2, 2)).collect()[0]["fhash"] == "0"


def test_frame_ahash_wide_grid_chunks(spark):
    # 64 cells exercises the 32-bit conv chunking: checkerboard
    px = [[float((r + c) % 2 * 255) for c in range(8)] for r in range(8)]
    df = spark.createDataFrame(
        [(1, 0, px)],
        "media_id long, frame_idx int, pixels array<array<double>>",
    )
    h = frame_ahash(df, grid=(8, 8)).collect()[0]["fhash"]
    assert len(h) == 16
    assert h == "55aa55aa55aa55aa"  # rows alternate 01010101 / 10101010


def test_frame_ahash_rejects_bad_grid(spark):
    df = spark.createDataFrame(
        [(1, 0, [[1.0]])],
        "media_id long, frame_idx int, pixels array<array<double>>",
    )
    with pytest.raises(ValueError, match="multiple of 4"):
        frame_ahash(df, grid=(1, 1))


def test_video_near_dup_validation(spark):
    df = spark.range(1).select(
        F.col("id").alias("media_id"), F.lit(b"x").alias("content")
    )
    with pytest.raises(ValueError, match="max_hamming"):
        video_near_dup(df, max_hamming=-1)
    with pytest.raises(ValueError, match="pigeonhole"):
        video_near_dup(df, grid=(2, 2), max_hamming=3)  # 4 bands > 1 hex


def test_video_near_dup_pipeline_twins_only(spark):
    """End-to-end through the real AVI demux: the registry fixture's
    three perturbed twins match at full overlap; LCG-distinct videos
    never pair."""
    from etl_tools_rs_spark.queries import REGISTRY

    rows = [
        tuple(r)
        for r in REGISTRY["video_near_dup_pipeline"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    ]
    assert rows == [(0, 100, 4, 1.0), (4, 104, 4, 1.0), (8, 108, 4, 1.0)]
