"""End-to-end example: a MULTIMODAL near-duplicate registry — one
dedup decision table across images, videos, and audio clips.

Companion to examples/training_data_pipeline.py (text dedup/pack/shard):
this one exercises the media side of corpus curation. All three
detectors share the same scale shape — candidates from banded equi-joins
(never all-pairs), exact verify, answer-sized pair lists:

1. ingest     — synthesize a small mixed-media batch executor-side
                (BMP gradients, uncompressed AVIs, 16-bit WAVs; every
                4th asset gets a perturbed "re-encode" twin)
2. image      — 64-bit aHash + pigeonhole-banded Hamming pairs
3. video      — in-plan frame aHash, (frame_idx, band)-keyed matching
4. audio      — Haitsma-Kalker delta-sign fingerprints (gain-invariant)
5. decide     — union the pair lists, cluster with connected
                components, keep the minimum id per cluster (the
                canonical asset), drop the rest

Every step is a resumable JobRunner command with its row count in the
job state — re-running the script skips completed steps.

Run:  python examples/multimodal_dedup_pipeline.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# modality id spaces stay disjoint so one cluster table can hold all three
IMG_BASE, VID_BASE, AUD_BASE = 0, 10_000, 20_000
TWIN_OFF = 100


def _make_media(spark, kind: str, base: int, n: int = 8):
    """n synthetic assets + a perturbed twin for every 4th, built
    executor-side inside mapInPandas (no driver-side payloads)."""
    ids = spark.range(n).select((F.col("id") + base).alias("media_id"))
    twins = ids.where((F.col("media_id") - base) % 4 == 0).select(
        (F.col("media_id") + TWIN_OFF).alias("media_id")
    )
    all_ids = ids.unionByName(twins)

    def _gen(it):
        import io
        import struct
        import wave

        import numpy as np
        import pandas as pd

        def shade(mid: int, i: int, p: int) -> int:
            x = (mid << 16) + (i << 8) + p
            x = (x * 2654435761) & 0xFFFFFFFF
            x ^= x >> 15
            x = (x * 1103515245) & 0xFFFFFFFF
            return (x >> 16) % 256

        def bmp(vid: int, w: int = 8, h: int = 8) -> bytes:
            pid = vid - TWIN_OFF if (vid - base) >= TWIN_OFF else vid
            stride = ((w * 3 + 3) // 4) * 4
            rows = bytearray()
            for r in range(h - 1, -1, -1):
                for c in range(w):
                    p = r * w + c
                    s = shade(pid, 0, p)
                    if vid != pid and p in (3, 27):
                        s = (s + 32) % 256
                    rows += bytes([s, s, s])
                rows += b"\x00" * (stride - w * 3)
            info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                               len(rows), 2835, 2835, 0, 0)
            head = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
            return head + info + bytes(rows)

        def avi(vid: int, n_fr: int = 8, w: int = 8, h: int = 8) -> bytes:
            pid = vid - TWIN_OFF if (vid - base) >= TWIN_OFF else vid
            stride = ((w * 3 + 3) // 4) * 4

            def chunk(fourcc, data):
                pad = b"\x00" if len(data) & 1 else b""
                return fourcc + struct.pack("<I", len(data)) + data + pad

            frames = []
            for i in range(n_fr):
                rows = bytearray()
                for r in range(h):
                    for c in range(w):
                        p = r * w + c
                        s = shade(pid, i, p)
                        if vid != pid and p in (5, 42):
                            s = (s + 32) % 256
                        rows += bytes([s, s, s])
                    rows += b"\x00" * (stride - w * 3)
                frames.append(bytes(rows))
            avih = struct.pack("<IIIIIIIIII4I", 40000, 0, 0, 0, n_fr, 0,
                               1, 0, w, h, 0, 0, 0, 0)
            payload = (
                b"AVI "
                + chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
                + chunk(b"LIST", b"movi"
                        + b"".join(chunk(b"00db", f) for f in frames))
            )
            return b"RIFF" + struct.pack("<I", len(payload)) + payload

        def wav(vid: int, rate: int = 8000) -> bytes:
            pid = vid - TWIN_OFF if (vid - base) >= TWIN_OFF else vid
            t = np.arange(rate) / rate
            x = np.zeros_like(t)
            for k in range(3):
                f = 400.0 + ((pid * 37 + k * 53) % 40) * 80.0
                env = 1.0 + 0.5 * np.sin(2 * np.pi * (2.0 + k) * t)
                x += env * np.sin(2 * np.pi * f * t) / 3.0
            if vid != pid:  # re-mastered twin
                x = 1.3 * x + 0.004 * np.sin(2 * np.pi * 1234.0 * t)
            pcm = (np.clip(x / 2.0, -1, 1) * 32767).astype("<i2").tobytes()
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(pcm)
            return buf.getvalue()

        maker = {"image": bmp, "video": avi, "audio": wav}[kind]
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [maker(int(m)) for m in pdf["media_id"]],
                }
            )

    return all_ids.mapInPandas(_gen, schema="media_id long, content binary")


def main(workdir: str | None = None) -> int:
    from etl_tools_rs_spark.jobs.runner import JobRunner
    from etl_tools_rs_spark.operators.dedup import connected_components
    from etl_tools_rs_spark.operators.multimodal import (
        audio_near_dup,
        image_ahash,
        ahash_near_dup,
        video_near_dup,
    )
    from etl_tools_rs_spark.session import get_spark
    from etl_tools_rs_spark.sinks.simple_store import SimpleStore

    work = workdir or tempfile.mkdtemp(prefix="mm_dedup_pipeline_")
    spark = get_spark("multimodal-dedup-example", shuffle_partitions=8)

    jr = JobRunner(
        "example-5", "mm-dedup", SimpleStore(f"{work}/state"),
        max_errors=0, stop_on_error=True,
    )

    def pairs_step(name: str, build):
        def step(_jr):
            df = build()
            df.write.mode("overwrite").parquet(f"{work}/{name}")
            return df.count()

        return jr.run_cmd(f"detect_{name}", step)

    images = _make_media(spark, "image", IMG_BASE)
    videos = _make_media(spark, "video", VID_BASE)
    audios = _make_media(spark, "audio", AUD_BASE)

    pairs_step(
        "image_pairs",
        lambda: ahash_near_dup(image_ahash(images), max_hamming=6)
        .select(
            F.col("id_a").alias("a"), F.col("id_b").alias("b"),
            F.lit("image").alias("modality"),
        ),
    )
    pairs_step(
        "video_pairs",
        lambda: video_near_dup(videos, every_ms=120)
        .select(
            F.col("video_a").alias("a"), F.col("video_b").alias("b"),
            F.lit("video").alias("modality"),
        ),
    )
    pairs_step(
        "audio_pairs",
        lambda: audio_near_dup(audios)
        .select(
            F.col("clip_a").alias("a"), F.col("clip_b").alias("b"),
            F.lit("audio").alias("modality"),
        ),
    )

    def decide(_jr):
        pairs = spark.read.parquet(
            f"{work}/image_pairs", f"{work}/video_pairs", f"{work}/audio_pairs"
        )
        comp = connected_components(pairs, "a", "b")
        decisions = comp.select(
            "member_id",
            "group_id",
            (F.col("member_id") == F.col("group_id")).alias("keep"),
        )
        decisions.write.mode("overwrite").parquet(f"{work}/decisions")
        return decisions.where(~F.col("keep")).count()

    n_dropped = jr.run_cmd("decide_dedup", decide)
    state = jr.complete()

    print(
        json.dumps(
            {
                "workdir": work,
                "dropped": n_dropped,
                "steps": {
                    name: s.status for name, s in state.step_history.items()
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:2]))
