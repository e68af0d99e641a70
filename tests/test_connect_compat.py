"""Spark Connect compatibility audit (r4, VERDICT r3 task #6).

Connect sessions have no ``sparkContext``, no RDD API, and no classic
accumulators. The engine's touch-points are: the small-file guard
(``ensure_min_partitions``), the cluster-width default
(``default_parallelism``), and the StreamHandler executor dispatch
(``run_stream_handler``). No Connect server exists in this container, so
the session-kind detector is exercised with a mocked Connect class and
the Connect code paths are forced via monkeypatching the detector —
every statement in those arms runs against a real classic session (the
arms deliberately use only Connect-available API: ``conf``,
``inputFiles``, ``toLocalIterator``, ``count``)."""

from __future__ import annotations

import warnings

import pytest

from etl_tools_rs_spark import session as session_mod
from etl_tools_rs_spark.jobs import runner as runner_mod
from etl_tools_rs_spark.jobs.runner import JobRunner, StreamHandler
from etl_tools_rs_spark.session import (
    default_parallelism,
    ensure_min_partitions,
    is_connect,
)
from etl_tools_rs_spark.sinks.simple_store import MemoryStore


class _FakeConnectSession:
    """Stands in for pyspark.sql.connect.session.SparkSession."""


_FakeConnectSession.__module__ = "pyspark.sql.connect.session"


def test_is_connect_detects_module(spark):
    assert not is_connect(spark)
    assert is_connect(_FakeConnectSession())


def test_default_parallelism_classic(spark):
    assert default_parallelism(spark) == spark.sparkContext.defaultParallelism


def test_default_parallelism_connect_arm(spark, monkeypatch):
    monkeypatch.setattr(session_mod, "is_connect", lambda s: True)
    want = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert session_mod.default_parallelism(spark) == want


def test_ensure_min_partitions_connect_arm_file_backed(
    spark, tmp_path, monkeypatch
):
    """File-backed frame under the Connect arm: file count < target ⇒
    repartition to the conf width (inputFiles is the Connect-safe proxy)."""
    p = str(tmp_path / "one.parquet")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    monkeypatch.setattr(session_mod, "is_connect", lambda s: True)
    out = session_mod.ensure_min_partitions(df)
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # verified on the classic RDD API — the plan itself must carry the
    # repartition regardless of session kind
    assert out.rdd.getNumPartitions() == target


def test_ensure_min_partitions_connect_arm_memory_frame(spark, monkeypatch):
    """Non-file frames pass through unchanged on Connect (no partition
    count available, no file proxy — and the guard is a local aid)."""
    df = spark.createDataFrame([(1,), (2,)], "x int")
    monkeypatch.setattr(session_mod, "is_connect", lambda s: True)
    assert session_mod.ensure_min_partitions(df) is df


def test_ensure_min_partitions_classic_unchanged(spark):
    df = spark.range(10).repartition(64)
    assert ensure_min_partitions(df, 32) is df


class _PartitionOnlyHandler(StreamHandler):
    """Overrides ONLY process_partition — the handler kind that used to
    die on sparkContext under Connect."""

    def __init__(self):
        self.batches = 0
        self.shutdown_called = False

    def process_partition(self, rows):
        n_ok = n_err = 0
        self.batches += 1
        for row in rows:
            if row["id"] == "b":
                n_err += 1
            else:
                n_ok += 1
        return (n_ok, n_err)

    def shutdown(self, runner):
        self.shutdown_called = True


def _df(spark):
    from etl_tools_rs_spark.sources.memory import CsvLinesSource

    csv = ["id,name", "a,Alice", "b,Bob", "c,Carol", "d,Dave"]
    return CsvLinesSource(csv, schema="id string, name string").to_df(spark)


def test_stream_handler_connect_pseudo_partition(spark, monkeypatch):
    """Connect dispatch: partition-only handlers run driver-side as ONE
    pseudo-partition with a RuntimeWarning — same counts, same budget
    accounting, no sparkContext touched."""
    monkeypatch.setattr(runner_mod, "is_connect", lambda s: True)
    jr = JobRunner("cx1", "connect_handler", MemoryStore(), max_errors=10)
    h = _PartitionOnlyHandler()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        step = jr.run_stream_handler("consume", _df(spark), h)
    assert any("pseudo-partition" in str(w.message) for w in caught)
    # driver-side: the handler object mutates in-process (unlike the
    # pickled executor path), proving exactly one pseudo-partition ran
    assert h.batches == 1
    assert h.shutdown_called
    assert step.total_lines_scanned == 4 and step.num_errors == 1


def test_stream_handler_classic_path_unaffected(spark, monkeypatch):
    """Same handler on a classic session takes foreachPartition: the
    driver-side instance never mutates (it is pickled to tasks)."""
    jr = JobRunner("cx2", "classic_handler", MemoryStore(), max_errors=10)
    h = _PartitionOnlyHandler()
    step = jr.run_stream_handler("consume", _df(spark), h)
    assert h.batches == 0  # executor copies did the work
    assert step.total_lines_scanned == 4 and step.num_errors == 1
