"""Privacy / governance operators for training-data pipelines:
re-identification audits (k-anonymity, l-diversity) and right-to-be-
forgotten deletion cascades.

Reference parity: none (the reference has no governance surface,
readme.md:1-8); this is extension surface alongside dedup/text, the
compliance half of corpus curation — before shipping a corpus you audit
how identifiable its quasi-identifier combinations are (Sweeney 2002,
k-anonymity; Machanavajjhala 2007, l-diversity), and when a data subject
is erased you must cascade the deletion through every derived table
(GDPR Art. 17 — the "forget me" path every lakehouse needs).

Scale posture:
- the k-anonymity audit is ONE hash aggregate on the quasi-identifier
  key (+ a count-distinct for l-diversity) — the same shape as any
  groupBy, no collect, no window;
- the deletion cascade keeps the deleted-key sets as DataFrames and
  resolves children via (broadcast-able) semi/anti joins — the deletion
  list is always tiny relative to the corpus, so every hop is a
  broadcast join against a 100 TB fact table, never a shuffle of it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Per-equivalence-class audit: group by the quasi-identifier
    columns and report each class's size ``k`` (how many records share
    this quasi-identifier combination — a class of size 1 is a unique,
    re-identifiable record) and, when ``sensitive_col`` is given, its
    l-diversity ``l`` = exact distinct sensitive values (a class where
    everyone shares one diagnosis leaks it even at large k).

    One hash aggregate; count-distinct adds the standard expand, still
    keyed by the quasi columns. Output: ``quasi_cols + (k bigint
    [, l bigint])``.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("k")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("l"))
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: list[str],
    k_min: int,
    sensitive_col: str | None = None,
    l_min: int | None = None,
    scale: int = 6,
) -> DataFrame:
    """One-row corpus verdict over :func:`k_anonymity_audit`: total
    rows/classes, the minimum class size actually achieved (the
    dataset's k-anonymity), how many classes and rows fall below
    ``k_min``, and the at-risk row share (floor-scaled to ``scale``
    decimals — the engine's cross-engine double policy). With a
    sensitive column, the same below-threshold counts for ``l_min``.

    The audit aggregate folds to a second, scalar aggregate — shuffle
    is one row per equivalence class, output is one row.
    """
    audit = k_anonymity_audit(df, quasi_cols, sensitive_col)
    p = float(10**scale)
    below_k = F.col("k") < F.lit(k_min)
    aggs = [
        F.sum("k").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("k").cast("bigint").alias("min_k"),
        F.sum(F.when(below_k, 1).otherwise(0)).cast("bigint").alias(
            "classes_below_k"
        ),
        F.sum(F.when(below_k, F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("rows_below_k"),
    ]
    if sensitive_col is not None:
        if l_min is None:
            raise ValueError("l_min is required with sensitive_col")
        below_l = F.col("l") < F.lit(l_min)
        aggs += [
            F.min("l").cast("bigint").alias("min_l"),
            F.sum(F.when(below_l, 1).otherwise(0)).cast("bigint").alias(
                "classes_below_l"
            ),
            F.sum(F.when(below_l, F.col("k")).otherwise(0))
            .cast("bigint")
            .alias("rows_below_l"),
        ]
    out = audit.agg(*aggs)
    return out.withColumn(
        "at_risk_share",
        (
            F.floor(
                F.lit(p) * F.col("rows_below_k") / F.col("n_rows")
            )
            / F.lit(p)
        ).cast("double"),
    )


@dataclass
class DeleteCascade:
    """Result of :func:`propagate_deletes`: per-table surviving frames
    plus a tiny report frame ``(table, purged, kept)``."""

    survivors: dict[str, DataFrame]
    deleted_keys: dict[str, DataFrame]
    report: DataFrame


def propagate_deletes(
    tables: dict[str, DataFrame],
    keys: dict[str, str],
    seed_table: str,
    seed_keys: DataFrame,
    edges: list[tuple[str, str, str]],
    broadcast_keys: bool = True,
) -> DeleteCascade:
    """Right-to-be-forgotten cascade: starting from ``seed_keys`` (a
    one-column frame of ``seed_table`` primary keys to erase), walk the
    foreign-key ``edges`` — each ``(child_table, child_fk, parent_table)``,
    meaning ``child.child_fk`` references ``parent``'s primary key
    ``keys[parent]`` — and derive every child row transitively owned by
    an erased parent. Edges are processed in order, so chains compose:
    ``customer → orders → lineitem`` erases a customer's orders and
    those orders' line items. Each table's deleted set is tracked by
    its OWN primary key (``keys[table]``), which is what the next hop
    and the final anti join both need.

    Edges are re-ordered TOPOLOGICALLY over the implied parent→child
    DAG before processing, so every table's deletion set is complete
    (all of its incoming edges applied) before any of its outgoing
    edges runs — a diamond like ``A→B, A→C, B→D, C→D`` given in an
    unlucky list order would otherwise consume ``D``'s set before a
    later edge enlarged it and silently under-delete downstream (a
    compliance hazard in an RTBF path). Cyclic FK graphs are rejected.

    Deletion lists are tiny vs the corpus, so with ``broadcast_keys``
    every hop is a broadcast semi/anti join against the fact table: no
    fact-table shuffle anywhere in the cascade. The report frame is a
    union of one-row counts per table.
    """
    if seed_table not in tables:
        raise ValueError(f"unknown seed table {seed_table!r}")
    for t in tables:
        if t not in keys:
            raise ValueError(f"no primary key given for table {t!r}")
    # Kahn's algorithm over tables (edge = parent→child): every edge
    # INTO a node is emitted before any edge OUT of it, so deletion
    # sets are complete when consumed (diamond-safe).
    import heapq

    nodes = {seed_table} | {c for c, _, p in edges} | {p for _, _, p in edges}
    out_edges: dict[str, list[tuple[str, str, str]]] = {n: [] for n in nodes}
    indeg = {n: 0 for n in nodes}
    for e in edges:
        out_edges[e[2]].append(e)
        indeg[e[0]] += 1
    ready = sorted(n for n in nodes if indeg[n] == 0)
    heapq.heapify(ready)
    topo_edges: list[tuple[str, str, str]] = []
    popped = 0
    while ready:
        n = heapq.heappop(ready)
        popped += 1
        for e in out_edges[n]:
            topo_edges.append(e)
            indeg[e[0]] -= 1
            if indeg[e[0]] == 0:
                heapq.heappush(ready, e[0])
    if popped != len(nodes):
        cyclic = sorted(n for n, d in indeg.items() if d > 0)
        raise ValueError(
            f"cyclic FK graph (tables {cyclic}) — a delete cascade "
            "needs a DAG of foreign keys"
        )
    DELC = "__del_key"
    del_keys: dict[str, DataFrame] = {
        seed_table: seed_keys.select(
            F.col(seed_keys.columns[0]).alias(DELC)
        ).distinct()
    }
    for child, child_fk, parent in topo_edges:
        if child not in tables:
            raise ValueError(f"unknown child table {child!r}")
        if parent not in del_keys:
            raise ValueError(
                f"edge {child!r} references {parent!r}, which has no "
                "deletion set — it is not the seed table and no FK "
                "path connects it to the seed"
            )
        pk = del_keys[parent]
        pk = F.broadcast(pk) if broadcast_keys else pk
        doomed = tables[child].join(
            pk, on=F.col(child_fk) == F.col(DELC), how="semi"
        )
        new_keys = doomed.select(F.col(keys[child]).alias(DELC)).distinct()
        # a table can be reached via several edges — union the key sets
        if child in del_keys:
            del_keys[child] = (
                del_keys[child].unionByName(new_keys).distinct()
            )
        else:
            del_keys[child] = new_keys
    survivors: dict[str, DataFrame] = {}
    reports = []
    for name, df in tables.items():
        if name in del_keys:
            ks = del_keys[name]
            ks_b = F.broadcast(ks) if broadcast_keys else ks
            on = F.col(keys[name]) == F.col(DELC)
            surv = df.join(ks_b, on=on, how="anti")
            purged = df.join(ks_b, on=on, how="semi")
        else:
            surv, purged = df, df.limit(0)
        survivors[name] = surv
        reports.append(
            purged.agg(F.count(F.lit(1)).alias("purged"))
            .crossJoin(surv.agg(F.count(F.lit(1)).alias("kept")))
            .select(
                F.lit(name).alias("table"),
                F.col("purged").cast("bigint"),
                F.col("kept").cast("bigint"),
            )
        )
    report = reports[0]
    for r in reports[1:]:
        report = report.unionByName(r)
    return DeleteCascade(
        survivors=survivors, deleted_keys=del_keys, report=report
    )
