"""Entity resolution survivorship: golden-record construction.

The matching half of entity resolution already exists in this engine —
:func:`etl_tools_rs_spark.operators.fuzzy.fuzzy_join` generates
bounded-edit-distance candidate links without an all-pairs comparison,
and :func:`etl_tools_rs_spark.operators.dedup.connected_components`
clusters links into entities in O(log²n) rounds. This module adds the
third classic MDM stage: collapsing each entity's member records into
ONE canonical ("golden") record under per-attribute survivorship rules.

Reference parity note: the reference engine (ytitov/etl-tools-rs) has no
relational operators at all — entity resolution is extension surface,
motivated by the training-data-pipeline brief (multi-source corpus
ingestion needs source-of-truth collapse before dedup-aware sampling).

Scale shape (100 TB posture): every rule is a plain hash aggregate on
the entity key — one shuffle for the whole rule set, plus one extra
(entity, value)-keyed aggregate per ``most_frequent`` column (mode needs
per-value counts; the intermediate is bounded by the input, and the
second-stage max-of-struct state is one row per entity). No windows, no
collects, no row-at-a-time Python.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RULES = (
    "min",
    "max",
    "sum",
    "longest",
    "most_frequent",
    "count_distinct",
    "source_precedence",
    "most_recent",
)


def _direct_rule(col: str, rule: str) -> Column:
    if rule == "min":
        return F.min(col).alias(col)
    if rule == "max":
        return F.max(col).alias(col)
    if rule == "sum":
        return F.sum(col).alias(col)
    if rule == "count_distinct":
        return F.count_distinct(col).alias(col)
    if rule == "longest":
        # deterministic: longest value, ties broken toward the GREATER
        # value (struct comparison is field-by-field) — never "first seen"
        return (
            F.max(F.struct(F.length(F.col(col)).alias("l"),
                           F.col(col).alias("v")))
            .getField("v")
            .alias(col)
        )
    raise ValueError(f"unknown survivorship rule {rule!r} for {col!r}")


def golden_records(
    df: DataFrame,
    entity_col: str,
    rules: Mapping[str, str],
    count_col: str = "n_members",
    source_col: str | None = None,
    precedence: list[str] | None = None,
    recency_col: str | None = None,
) -> DataFrame:
    """One canonical row per ``entity_col`` group, each attribute
    collapsed by its survivorship rule. ``rules`` maps column → one of:

    - ``min`` / ``max`` / ``sum`` — plain aggregates (nulls ignored, SQL
      semantics);
    - ``longest`` — the longest value, ties to the greater value;
    - ``most_frequent`` — the modal value, ties broken toward the
      GREATER value (count desc, value desc) so results are
      deterministic and oracle-reproducible (Spark's own ``mode()`` and
      DuckDB's are tie-arbitrary — unusable for a value-hash gate);
    - ``count_distinct`` — distinct member values (provenance width);
    - ``source_precedence`` — the value from the most-trusted source
      system: ``precedence`` lists sources best-first, ``source_col``
      names the column carrying the source tag (both required; sources
      absent from the list rank LAST). NULL values never donate; among
      equal-precedence members ties break toward the GREATER value.
      The classic MDM source-of-truth policy;
    - ``most_recent`` — the value from the member with the greatest
      ``recency_col`` (required; any orderable type). Rows with a NULL
      timestamp or value never donate; timestamp ties break toward the
      GREATER value. The classic last-write-wins policy.

    Output: ``entity_col``, ``count_col`` (member count), then one
    column per rule entry, same names as the input columns.

    Every rule EXCEPT ``most_frequent`` rides ONE hash aggregate
    (``source_precedence``/``most_recent`` are max-of-struct aggregates
    — argmax without a window or a per-entity list); each
    ``most_frequent`` column adds one (entity, value) pre-aggregate
    whose second stage carries a single (count, value) struct per
    entity — mode without ever materializing a per-entity value list.
    """
    for c, rule in rules.items():
        if rule not in RULES:
            raise ValueError(
                f"unknown survivorship rule {rule!r} for column {c!r}; "
                f"expected one of {RULES}"
            )
        if c not in df.columns:
            raise ValueError(f"rule column {c!r} not in DataFrame")
    needs_prec = [c for c, r in rules.items() if r == "source_precedence"]
    if needs_prec and (source_col is None or not precedence):
        raise ValueError(
            "source_precedence rule needs source_col= and a non-empty "
            f"precedence= list (columns: {needs_prec})"
        )
    needs_rec = [c for c, r in rules.items() if r == "most_recent"]
    if needs_rec and recency_col is None:
        raise ValueError(
            f"most_recent rule needs recency_col= (columns: {needs_rec})"
        )
    aggs = [F.count(F.lit(1)).alias(count_col)]
    mode_cols = []
    for c, rule in rules.items():
        if rule == "most_frequent":
            mode_cols.append(c)
        elif rule == "source_precedence":
            # rank best source = highest number so ONE max-of-struct
            # aggregate is the argmax; unknown sources rank 0 (last)
            rank = F.lit(0)
            for i, s in enumerate(reversed(precedence)):
                rank = F.when(F.col(source_col) == s, F.lit(i + 1)).otherwise(
                    rank
                )
            aggs.append(
                F.max(
                    F.when(
                        F.col(c).isNotNull(),
                        F.struct(rank.alias("r"), F.col(c).alias("v")),
                    )
                )
                .getField("v")
                .alias(c)
            )
        elif rule == "most_recent":
            aggs.append(
                F.max(
                    F.when(
                        F.col(c).isNotNull()
                        & F.col(recency_col).isNotNull(),
                        F.struct(
                            F.col(recency_col).alias("t"), F.col(c).alias("v")
                        ),
                    )
                )
                .getField("v")
                .alias(c)
            )
        else:
            aggs.append(_direct_rule(c, rule))
    out = df.groupBy(entity_col).agg(*aggs)
    for c in mode_cols:
        mode = (
            df.groupBy(entity_col, c)
            .agg(F.count(F.lit(1)).alias("_n"))
            .groupBy(entity_col)
            .agg(
                F.max(F.struct(F.col("_n"), F.col(c).alias("_v")))
                .getField("_v")
                .alias(c)
            )
        )
        out = out.join(mode, entity_col)
    return out


def resolve_entities(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    key_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """Record linkage of two sources into entity ids: fuzzy-link
    ``left`` × ``right`` on ``key_col`` within ``max_distance`` edits
    (blocked candidate generation, never all-pairs), cluster links with
    connected components, and return every input record tagged with its
    ``entity_id`` (the minimum member id of its component; unlinked
    records are singleton entities under their own id).

    ``id_col`` must be globally unique across BOTH sources (offset one
    side's ids if they collide). Columns of ``left`` and ``right`` must
    match (unionByName).

    Scale: candidate links come from deletion/segment-key equi-joins
    (``fuzzy.fuzzy_join``); components converge in O(log²n)
    star-contraction rounds on the LINK set, which is answer-sized, not
    corpus-sized; the final tag is one left join on id.
    """
    from etl_tools_rs_spark.operators.dedup import connected_components
    from etl_tools_rs_spark.operators.fuzzy import fuzzy_join

    recs = left.unionByName(right)
    pairs = fuzzy_join(
        left.select(F.col(id_col).alias("_ida"), F.col(key_col).alias("_ka")),
        right.select(F.col(id_col).alias("_idb"), F.col(key_col).alias("_kb")),
        "_ka",
        "_kb",
        max_distance=max_distance,
    ).select("_ida", "_idb")
    comp = connected_components(pairs, "_ida", "_idb")
    return (
        recs.join(comp, recs[id_col] == comp["member_id"], "left")
        .withColumn("entity_id", F.coalesce(F.col("group_id"), F.col(id_col)))
        .drop("member_id", "group_id")
    )
