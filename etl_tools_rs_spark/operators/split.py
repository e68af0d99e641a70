"""Stream fan-out.

Reference parity: ``split_datasources`` / ``DuplicateDataSource`` — clone
one source into N identical streams; channel(1) lock-steps all consumers to
the slowest (reference: etl-core/src/splitter.rs:10-139; the reference's own
disabled test flags this design as broken,
etl-core/ignore_tests/splitter.rs:10-18).

Spark-first: cache the shared input once and let N downstream plans consume
it independently — consumers are decoupled (no lock-step), and each
downstream still gets full Catalyst optimization from the cache boundary.
Documented divergence per SURVEY §7.4.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def fan_out(
    df: DataFrame,
    consumers: list[Callable[[DataFrame], object]],
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    parallel: bool = False,
) -> list[object]:
    """Run N consumers over one cached input; returns their results.

    ``parallel=True`` submits consumers from a thread pool — Spark's
    scheduler is thread-safe and overlaps the actions (the engine analogue
    of the reference's concurrently-awaited output tasks, job.rs:433-451).
    """
    df = df.persist(storage_level)
    try:
        if parallel:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=max(1, len(consumers))) as ex:
                return list(ex.map(lambda c: c(df), consumers))
        return [c(df) for c in consumers]
    finally:
        df.unpersist()
