"""Snapshot merge (upsert) operators — MERGE INTO semantics on plain
parquet snapshots.

The reference's only write semantics are append-style INSERTs
(etl-mysql/src/datastore.rs:142-317); real pipelines also need
last-writer-wins upserts and delete application when refreshing a
dimension/state table from a change feed. With no table format
(Delta/Iceberg) assumed, the engine expresses MERGE as a pure
DataFrame computation producing the NEW snapshot — written atomically by
the caller (write to a fresh path, swap pointers), which is exactly how
snapshot tables are maintained on object storage at scale.

Scale posture: one shuffle on the merge key (union + per-key window);
change feeds are usually ≪ the base snapshot, so AQE picks the cheap
side automatically; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_snapshot(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str | None = None,
) -> DataFrame:
    """Last-writer-wins upsert: rows from ``updates`` replace same-key
    rows in ``base``; unmatched update rows are inserts.

    With ``version_col``, the survivor per key is the row with the
    greatest version (updates win version ties — the UPDATE arm of MERGE);
    without it, any update row beats any base row. Schemas must match
    (``unionByName``). Deterministic for a deterministic version order;
    one shuffle on ``keys``.
    """
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    order = (
        [F.col(version_col).desc(), F.col("_src").desc()]
        if version_col
        else [F.col("_src").desc()]
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def apply_deletes(
    base: DataFrame, deletes: DataFrame, keys: list[str]
) -> DataFrame:
    """DELETE arm of MERGE: drop base rows whose key appears in
    ``deletes``. A left-anti join on the key — broadcast when the delete
    set is small (the common tombstone-feed case)."""
    return base.join(deletes.select(*keys).distinct(), keys, "left_anti")


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    version_col: str | None = None,
) -> DataFrame:
    """Full CDC application: ``changes`` carries ``op_col`` in
    {'upsert', 'delete'}; deletes are applied after upserts of the same
    batch (a delete tombstone wins over an earlier upsert for its key).

    The composed form of ``upsert_snapshot`` + ``apply_deletes`` — one
    window shuffle plus one anti join.
    """
    ups = changes.filter(F.col(op_col) == "upsert").drop(op_col)
    dels = changes.filter(F.col(op_col) == "delete").drop(op_col)
    return apply_deletes(upsert_snapshot(base, ups, keys, version_col), dels, keys)


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    value_cols: list[str],
    ts_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 historization from a change
    stream: collapse consecutive same-value observations per key into
    validity intervals — the dimension-table build every warehouse runs
    on a CDC feed ("what was this user's plan on date X?").

    A version starts where any tracked column IS DISTINCT FROM its
    previous observation (null-safe, so NULL→value and value→NULL both
    open versions). Output: one row per (key, version run) with
    ``valid_from`` (first observation), ``valid_to`` (next version's
    start, NULL while current) and ``is_current``.

    Plan: one shuffle on the key — change flag + running version number
    in one window pass, a per-(key, version) aggregate, and the
    ``valid_to`` lead reuses the same key partitioning (no second
    exchange). Ordering must be total for determinism: pass ``tiebreak``
    columns when ``ts_col`` can tie (e.g. the event id).
    """
    if not keys or not value_cols:
        raise ValueError("scd2_history needs key and value columns")
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    flagged = changes.withColumn(
        "_new",
        F.when(F.row_number().over(w) == 1, 1)
        .when(changed, 1)
        .otherwise(0),
    )
    version = F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    runs = (
        flagged.withColumn("_ver", version)
        .groupBy(*keys, "_ver")
        .agg(
            *[F.min(c).alias(c) for c in value_cols],  # constant within a run
            F.min(ts_col).alias("valid_from"),
            F.count(F.lit(1)).cast("bigint").alias("n_observations"),
        )
    )
    wv = Window.partitionBy(*keys).orderBy(F.col("_ver").asc())
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(wv))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed("_ver", "version")
        .select(
            *keys,
            F.col("version").cast("bigint").alias("version"),
            *value_cols,
            "valid_from",
            "valid_to",
            "is_current",
            "n_observations",
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Reconcile two snapshots of the same table: one row per key with
    ``change_type`` ∈ {added, removed, changed, unchanged} — the audit /
    regression-diff op every pipeline migration runs ("what did the new
    code change?").

    ``compare_cols`` defaults to every shared non-key column; comparison
    is null-safe (NULL == NULL, NULL != value). One full-outer hash join
    on the keys — both sides shuffle once; the verdict is a pure
    projection. ``include_unchanged=False`` (default) keeps the result
    change-sized (at 100 TB, unchanged rows dominate and nobody reads
    them).
    """
    if not keys:
        raise ValueError("snapshot_diff needs at least one key column")
    shared = [c for c in new.columns if c in set(old.columns) and c not in keys]
    cmp_cols = compare_cols if compare_cols is not None else shared
    for c in cmp_cols:
        if c not in shared:
            raise ValueError(f"compare column {c!r} not present in both snapshots")
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in cmp_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in cmp_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    differs = F.lit(False)
    for c in cmp_cols:
        differs = differs | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
