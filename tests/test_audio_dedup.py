"""Acoustic fingerprinting + audio near-dup (operators/multimodal.py::
audio_fingerprint_frames / audio_near_dup): Haitsma-Kalker delta-sign
bits, gain invariance, frame-aligned matching."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from etl_tools_rs_spark.operators.multimodal import (
    audio_fingerprint_frames,
    audio_near_dup,
)


def _wav(x: np.ndarray, rate: int = 8000) -> bytes:
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm)
    return buf.getvalue()


def _clip(seed: int, rate: int = 8000, secs: float = 1.0) -> np.ndarray:
    t = np.arange(int(rate * secs)) / rate
    x = np.zeros_like(t)
    for k in range(3):
        f = 400.0 + ((seed * 37 + k * 53) % 40) * 80.0
        env = 1.0 + 0.5 * np.sin(2 * np.pi * (2.0 + k) * t)
        x += env * np.sin(2 * np.pi * f * t) / 3.0
    return x / 2.0


def test_fingerprint_shape_and_determinism():
    words = audio_fingerprint_frames(_wav(_clip(1)), frame_ms=64, n_bands=32)
    # 8000 samples / 512-sample frames = 15 frames -> 14 delta words
    assert len(words) == 14
    assert all(len(w) == 8 for w in words)
    assert words == audio_fingerprint_frames(
        _wav(_clip(1)), frame_ms=64, n_bands=32
    )


def test_fingerprint_gain_invariant():
    # sign-of-delta bits survive re-mastering: 0.5x and (clipped) 1.4x
    base = audio_fingerprint_frames(_wav(_clip(2)), frame_ms=64, n_bands=32)
    half = audio_fingerprint_frames(
        _wav(0.5 * _clip(2)), frame_ms=64, n_bands=32
    )
    assert base == half


def test_fingerprint_distinct_clips_diverge():
    a = audio_fingerprint_frames(_wav(_clip(3)), frame_ms=64, n_bands=32)
    b = audio_fingerprint_frames(_wav(_clip(4)), frame_ms=64, n_bands=32)
    ham = sum(
        bin(int(x, 16) ^ int(y, 16)).count("1") for x, y in zip(a, b)
    )
    assert ham > 4 * len(a)  # way beyond the matcher's 4-bit budget


def test_fingerprint_edge_cases():
    with pytest.raises(ValueError, match="multiple of 4"):
        audio_fingerprint_frames(_wav(_clip(1)), n_bands=30)
    # one-frame clip: no predecessor, no words
    assert audio_fingerprint_frames(_wav(_clip(1)[:512])) == []
    with pytest.raises(Exception):
        audio_fingerprint_frames(b"not a wav")


def test_audio_near_dup_error_as_record(spark):
    # garbage payloads must not fail the job — they just produce no pairs
    df = spark.createDataFrame(
        [(1, bytearray(b"junk")), (2, bytearray(_wav(_clip(5))))],
        "media_id long, content binary",
    )
    assert audio_near_dup(df).count() == 0


def test_audio_near_dup_pipeline_twins_only(spark):
    from etl_tools_rs_spark.queries import REGISTRY

    rows = [
        tuple(r)
        for r in REGISTRY["audio_near_dup_pipeline"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    ]
    assert rows == [(0, 100, 14, 1.0), (4, 104, 14, 1.0), (8, 108, 14, 1.0)]
