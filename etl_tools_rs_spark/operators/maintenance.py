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

from etl_tools_rs_spark.session import default_parallelism


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
    parts = num_partitions or default_parallelism(df.sparkSession)
    key_cols = [F.col(c) for c in cols]
    return df.repartitionByRange(parts, *key_cols).sortWithinPartitions(*key_cols)


def zorder_by(
    df: DataFrame,
    cols: list[str],
    num_partitions: int | None = None,
    bits_per_col: int = 16,
) -> DataFrame:
    """Z-order (Morton-curve) clustering for MULTI-column scan pruning:
    quantize each column to ``bits_per_col`` bits over its [min, max]
    range, bit-interleave the quantized values into one z-value, then
    range-partition + sort by it. Files end up covering small hyper-
    rectangles of the key space, so parquet min/max stats prune scans for
    a predicate on ANY of the clustered columns — where ``cluster_by``
    (lexicographic) only prunes prefix predicates.

    Two passes: a cheap global min/max agg per column (one scalar row to
    the driver), then one range shuffle. Quantization is linear over the
    value range — heavily skewed columns should be pre-transformed (log,
    rank-bucket) before z-ordering, the same caveat Delta/Iceberg OPTIMIZE
    ZORDER carries. Timestamp/date columns are quantized via their
    microsecond epoch. All bit math is JVM expressions (no UDF).
    """
    parts = num_partitions or default_parallelism(df.sparkSession)
    zed = df.withColumn("__z", zorder_key(df, cols, bits_per_col))
    return (
        zed.repartitionByRange(parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits_per_col: int = 16
) -> F.Column:
    """The Morton z-value COLUMN used by :func:`zorder_by` (r4: factored
    out so layout-quality audits can group/aggregate on it directly):
    quantize each column to ``bits_per_col`` bits over its global
    [min, max] (one scalar agg to the driver, folded back as literals),
    then bit-interleave — output bit ``b*n_cols + j`` is bit ``b`` of
    column ``j``'s quantum. Pure JVM bit expressions, no UDF; the
    quantization is the same linear map Delta/Iceberg OPTIMIZE ZORDER
    uses, with the same skew caveat."""
    if not (1 <= bits_per_col and bits_per_col * len(cols) <= 63):
        raise ValueError("need 1 <= bits_per_col * len(cols) <= 63")

    def numeric(c: str) -> F.Column:
        dt = df.schema[c].dataType.simpleString()
        col = F.col(c)
        if dt in ("timestamp", "timestamp_ntz"):
            return F.unix_micros(col.cast("timestamp")).cast("double")
        if dt == "date":
            return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("double")
        return col.cast("double")

    stats = df.agg(
        *[F.min(numeric(c)).alias(f"_lo_{i}") for i, c in enumerate(cols)],
        *[F.max(numeric(c)).alias(f"_hi_{i}") for i, c in enumerate(cols)],
    ).first()
    qmax = (1 << bits_per_col) - 1

    def quantized(c: str, i: int) -> F.Column:
        lo, hi = stats[f"_lo_{i}"], stats[f"_hi_{i}"]
        if lo is None or hi is None or hi == lo:
            return F.lit(0).cast("bigint")
        scaled = (numeric(c) - F.lit(float(lo))) / F.lit(float(hi - lo))
        q = F.floor(scaled * qmax).cast("bigint")
        return F.greatest(F.lit(0), F.least(F.lit(qmax).cast("bigint"), q))

    qs = [quantized(c, i) for i, c in enumerate(cols)]
    # interleave: output bit (b*n_cols + j) = bit b of column j's quantum
    z = F.lit(0).cast("bigint")
    n = len(cols)
    for b in range(bits_per_col):
        for j, q in enumerate(qs):
            bit = F.call_function("shiftright", q, F.lit(b)).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.call_function("shiftleft", bit, F.lit(b * n + j))
            )
    return z


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``keys`` so future joins and
    aggregations on those keys run with NO shuffle: two tables bucketed
    the same way join bucket-to-bucket (Catalyst drops both Exchanges),
    and a groupBy on the bucket keys aggregates partition-locally. This
    is THE pre-pay-the-shuffle-once move for a 100 TB fact table that is
    joined on the same key every day.

    ``sort_cols`` additionally sorts within buckets (saves the SMJ sort;
    enables per-file min/max pruning on the sort key). Bucketing requires
    ``saveAsTable`` (metastore tracks the layout); plain ``save(path)``
    silently drops bucket metadata, so this always writes a managed table.
    Keep ``spark.sql.sources.bucketing.enabled`` true (default) to read
    the layout back.
    """
    w = df.write.format(format).mode(mode).bucketBy(num_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 << 20,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-layout partitioned write (``path/col=value/...``): the
    coarse-pruning layer every time/tenant-organized 100 TB table needs —
    a reader filtering on a partition column touches only matching
    directories (PartitionFilters in the scan, pinned in tests), before
    parquet row-group stats even load.

    Rows are pre-shuffled on the partition columns so each output
    directory is written by few tasks (without this, every task writes a
    file into every partition — the small-file explosion
    ``compact_files`` exists to fix). Keep partition cardinality coarse
    (day, tenant-bucket): >100k directories makes listing the bottleneck;
    use ``cluster_by``/``zorder_by`` WITHIN partitions for fine pruning.
    """
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.format(format)
        .partitionBy(*partition_cols)
        .mode(mode)
        .save(path)
    )
