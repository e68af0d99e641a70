"""Authoring + law-check provenance for the r7 fixture-based oracles
(image_phash_near_dup, multimodal_audio_features, multimodal_jpeg_pipeline,
video/audio_near_dup_pipeline). Each section recomputes the authored
values embedded in etl_tools_rs_spark/queries.py FROM THE FIXTURE LAW and
asserts the independent structural checks that grounded them — run this
after changing any fixture law or decode path to regenerate/re-verify:

    python tools/author_fixture_oracles.py

Prints the VALUES blocks; exits non-zero if any law check fails or any
recomputed value differs from what queries.py currently embeds.
"""

from __future__ import annotations

import io
import itertools
import math
import re
import struct
import sys
import wave

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def phash_patterns() -> dict[int, int]:
    """The 4 pattern pHashes for image_phash_near_dup, with law checks:
    one hash per pattern (brightness invariance across all 8 variants),
    and the known cross-pattern Hamming structure (ramps 0/1 sit EXACTLY
    at the hamming-4 budget from the diagonal ramp 3; checkerboard 2 is
    far from everything)."""
    from etl_tools_rs_spark.operators.multimodal import phash_bytes

    def make_bmp(mid: int, w: int = 16, h: int = 16) -> bytes:
        pattern = int(mid) % 4
        bright = (int(mid) // 4) * 12
        stride = ((w * 3 + 3) // 4) * 4
        rows = bytearray()
        for r in range(h - 1, -1, -1):
            for c in range(w):
                if pattern == 0:
                    v = (r * 255) // max(1, h - 1)
                elif pattern == 1:
                    v = (c * 255) // max(1, w - 1)
                elif pattern == 2:
                    v = 255 if (r // 4 + c // 4) % 2 == 0 else 0
                else:
                    v = ((r + c) * 255) // max(1, h + w - 2)
                v = min(255, v // 2 + bright)
                rows += bytes([v, v, v])
            rows += b"\x00" * (stride - w * 3)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           len(rows), 2835, 2835, 0, 0)
        head = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
        return head + info + bytes(rows)

    hashes = {m: phash_bytes(make_bmp(m)) for m in range(32)}
    by_pattern: dict[int, set[str]] = {}
    for m, h in hashes.items():
        by_pattern.setdefault(m % 4, set()).add(h)
    assert all(len(s) == 1 for s in by_pattern.values()), (
        "brightness invariance violated"
    )
    ph = {p: int(next(iter(s)), 16) for p, s in by_pattern.items()}
    dist = {
        (a, b): bin(ph[a] ^ ph[b]).count("1")
        for a, b in itertools.combinations(range(4), 2)
    }
    assert dist[(0, 3)] == 4 and dist[(1, 3)] == 4, dist  # budget boundary
    assert all(d > 4 for k, d in dist.items() if k not in ((0, 3), (1, 3)))
    n_pairs = sum(
        1
        for a, b in itertools.combinations(range(32), 2)
        if bin(int(hashes[a], 16) ^ int(hashes[b], 16)).count("1") <= 4
    )
    assert n_pairs == 240, n_pairs
    return ph


def audio_centroids() -> dict[int, float]:
    """The 64 spectral centroids for multimodal_audio_features, with law
    checks: on-bin clips (even mid → freq divisible by the 10 Hz bin)
    track their synthesized frequency within 1 Hz; each parity
    subsequence is monotone (off-bin leakage biases odd mids uniformly
    upward, so cross-parity order is NOT a law)."""
    from etl_tools_rs_spark.operators.multimodal import wav_features

    feats = {}
    for mid in range(64):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            freq = 100.0 + float(mid) * 25.0
            w.writeframes(b"".join(
                struct.pack(
                    "<h",
                    int(12000 * math.sin(2 * math.pi * freq * i / 8000.0)),
                )
                for i in range(800)
            ))
        feats[mid] = wav_features(buf.getvalue())
    for parity in (0, 1):
        prev = None
        for mid in range(parity, 64, 2):
            c = feats[mid]["spectral_centroid_hz"]
            assert prev is None or c > prev, (mid, c, prev)
            prev = c
    for mid in range(0, 64, 2):
        freq = 100.0 + mid * 25.0
        assert abs(feats[mid]["spectral_centroid_hz"] - freq) < 1.0, mid
    return {m: feats[m]["spectral_centroid_hz"] for m in range(64)}


def main() -> int:
    src = open("etl_tools_rs_spark/queries.py").read()

    ph = phash_patterns()
    for p, h in ph.items():
        assert f"({p}, CAST({h} AS BIGINT))" in src, (
            f"queries.py phash literal for pattern {p} != recomputed {h}"
        )
    print(f"image_phash_near_dup: 4 pattern hashes verified {list(ph.values())}")

    cents = audio_centroids()
    block = src.split("cent(media_id, c) AS (VALUES")[1]
    block = block.split(")\n    SELECT")[0]
    embedded = dict(
        (int(m), float(v))
        for m, v in re.findall(r"\((\d+), (\d+\.\d+)\)", block)
    )
    for m, v in cents.items():
        assert embedded.get(m) == v, (m, v, embedded.get(m))
    print("multimodal_audio_features: 64 centroids verified")

    # jpeg / video / audio near-dup law tables are checked by the gate
    # itself (engine output vs authored VALUES); their authoring law
    # checks live in the r7 session commands and the operator unit tests
    # (tests/test_jpeg.py round-trip, test_video_dedup/test_audio_dedup
    # twin separation). Nothing to recompute here without Spark.
    print("all authored-oracle law checks pass")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
