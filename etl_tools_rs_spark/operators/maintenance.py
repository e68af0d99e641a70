"""Table-maintenance operators: small-file compaction and sort-clustering.

No reference equivalent (the reference writes one file per output —
SURVEY §2.2); these are the jobs a 100 TB lakehouse runs nightly. Small
files are the canonical large-pipeline failure mode: a 100 TB table in
1 MB files means 100M scan tasks, metadata-bound planning, and dead
throughput. Compaction rewrites partitions into target-size files;
clustering additionally range-orders rows so parquet min/max stats prune
scans for the clustered columns.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def _list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path`` — Hadoop FS API,
    so the same code works for file://, hdfs:// and s3a://."""
    fs, p = _fs_and_path(spark, path)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden
        out.append((st.getPath().toString(), st.getLen()))
    return out


@dataclass
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int
    target_file_bytes: int


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    format: str = "parquet",
) -> CompactionStats:
    """Rewrite a directory of (typically many small) data files into
    ``ceil(total_bytes / target_file_bytes)`` right-sized files.

    Write-then-swap: the compacted copy lands in ``<path>__compacting``
    first and replaces the original only after the write commits, so a
    failed run leaves the table readable (no in-place truncation). On an
    object store the swap is two metadata moves.

    Scale notes: the rewrite is one round-robin repartition — no key
    shuffle skew; readers of the compacted table regain full
    ``maxPartitionBytes`` scan parallelism. Compression typically improves
    too (bigger row groups, better dictionary pages). Returns before/after
    file counts for observability.
    """
    files = _list_data_files(spark, path)
    n_before = len(files)
    total = sum(sz for _, sz in files)
    n_files = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.format(format).load(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.format(format).mode("overwrite").save(tmp)

    fs, p = _fs_and_path(spark, path)
    _, tp = _fs_and_path(spark, tmp)
    fs.delete(p, True)
    fs.rename(tp, p)
    return CompactionStats(
        files_before=n_before,
        files_after=len(_list_data_files(spark, path)),
        bytes_total=total,
        target_file_bytes=target_file_bytes,
    )


def cluster_by(
    df: DataFrame, cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Range-partition + sort rows by ``cols`` before writing, so parquet
    min/max column stats become selective: a later filter on a clustered
    column prunes whole files/row-groups instead of scanning everything
    (the poor man's Z-order — exact for prefix-ordered predicates, which
    covers the overwhelmingly common time/tenant layouts).

    One range shuffle (sampled boundaries, so balanced output files even
    on skewed keys) + partition-local sort; pair with ``compact_files``
    sizing via ``num_partitions``.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    key_cols = [F.col(c) for c in cols]
    return df.repartitionByRange(parts, *key_cols).sortWithinPartitions(*key_cols)
