"""Training-shard writer: deterministic, manifest-tracked output shards.

The last step of every training-data pipeline: split a corpus into N
shards whose assignment is a pure function of row content (so re-runs,
backfills and incremental appends land rows in the same shard — no
nondeterministic round-robin), write one file per shard, and emit a
manifest the training loader consumes (per-shard row counts, bytes,
paths).

The reference's file sink writes exactly one local file per output
(etl-core/src/datastore/fs.rs:184-242); this is that sink's distributed
generalization — N content-addressed files plus the accounting the
reference kept in DataOutputStats (mod.rs:45-50), persisted as JSON.

Scale shape: one hash shuffle on the shard key (repartition by the
shard column, so each shard is written by exactly one task → exactly one
file per shard); optional within-shard ordering is a sortWithinPartitions
(no extra shuffle). The row-count readback is a parquet metadata-only
aggregate (footer row counts — no data scan). Nothing but the manifest
dict touches the driver.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.maintenance import _fs_and_path, _list_data_files

SHARD_COL = "_shard"


@dataclass
class ShardManifest:
    path: str
    n_shards: int
    total_rows: int
    total_bytes: int
    shards: list[dict]  # {shard, rows, bytes, files}


def shard_assignment(key_cols: list[str], n_shards: int, salt: int = 0) -> F.Column:
    """Deterministic shard id in [0, n_shards): xxhash64 of the key
    columns (plus salt), made non-negative via pmod. Content-addressed —
    independent of partitioning, row order, and cluster size."""
    h = F.xxhash64(*[F.col(c) for c in key_cols], F.lit(salt))
    return F.pmod(h, F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_cols: list[str] | None = None,
    salt: int = 0,
    order_by: list[str] | None = None,
    format: str = "parquet",
) -> ShardManifest:
    """Write ``df`` as ``n_shards`` deterministic shards under
    ``path/shard=K/`` and a ``manifest.json`` beside them.

    ``key_cols`` drive the assignment hash (default: all columns —
    pure content addressing). ``order_by`` sorts rows WITHIN each shard
    (deterministic file contents, e.g. for curriculum or reproducible
    batching) without any global sort.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards!r}")
    keys = key_cols or df.columns
    out = df.withColumn(SHARD_COL, shard_assignment(keys, n_shards, salt))
    # repartition BY the shard column: every shard lands wholly in one
    # task, so partitionBy writes exactly one file per shard directory
    out = out.repartition(n_shards, F.col(SHARD_COL))
    if order_by:
        out = out.sortWithinPartitions(SHARD_COL, *order_by)
    base = path.rstrip("/")
    (
        out.write.format(format)
        .partitionBy(SHARD_COL)
        .mode("overwrite")
        .save(base)
    )

    spark = df.sparkSession
    # footer-only row counts per shard (parquet count(*) pushdown)
    counts = {
        r[SHARD_COL]: r["n"]
        for r in spark.read.format(format)
        .load(base)
        .groupBy(SHARD_COL)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_shard: dict[int, dict] = {
        k: {"shard": k, "rows": int(counts.get(k, 0)), "bytes": 0, "files": 0}
        for k in range(n_shards)
    }
    for fpath, sz in _list_data_files(spark, base):
        marker = f"{SHARD_COL}="
        if marker in fpath:
            k = int(fpath.split(marker)[1].split("/")[0])
            per_shard[k]["bytes"] += sz
            per_shard[k]["files"] += 1
    shards = [per_shard[k] for k in range(n_shards)]
    manifest = ShardManifest(
        path=base,
        n_shards=n_shards,
        total_rows=sum(s["rows"] for s in shards),
        total_bytes=sum(s["bytes"] for s in shards),
        shards=shards,
    )
    fs, p = _fs_and_path(spark, f"{base}/manifest.json")
    stream = fs.create(p, True)
    stream.write(
        json.dumps(
            {
                "path": manifest.path,
                "n_shards": manifest.n_shards,
                "total_rows": manifest.total_rows,
                "total_bytes": manifest.total_bytes,
                "shards": manifest.shards,
            },
            indent=2,
        ).encode("utf-8")
    )
    stream.close()
    return manifest


def read_manifest(spark, path: str) -> dict:
    """Load ``manifest.json`` written by :func:`write_training_shards`."""
    fs, p = _fs_and_path(spark, f"{path.rstrip('/')}/manifest.json")
    stream = fs.open(p)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))
