"""Declarative data-quality validation (expectations) over a DataFrame.

The pre-training-ingest gate every large pipeline runs: declare rules
(not-null, unique, range, set membership, regex, referential integrity,
arbitrary boolean predicates) and get back one row per rule with its
violation count — the shape alerting systems consume.

The reference has no validation surface at all (its closest analogue is
the per-record error budget, etl-job/src/job.rs:44-46 — counting *parse*
failures, not semantic rule failures); this operator is the engine-native
generalization of that error-accounting idea to declarative rules.

Scale shape — rule count never multiplies scan count:
- ALL row-local rules (not_null / in_range / in_set / matches / check)
  compile into a SINGLE aggregate over ONE scan: each rule is a
  conditional SUM column, so 50 rules still read the table once with
  map-side partial aggregation and a 1-row shuffle.
- `unique` rules need a groupBy on the key (one shuffle each, map-side
  combined; output is bounded by the number of duplicated keys).
- `foreign_key` rules reduce the reference side to its DISTINCT key set
  (dimension-sized in practice → broadcast anti-join; AQE demotes to a
  shuffled join only when the key set is genuinely huge).
Nothing collects to the driver; the result is a tiny DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, unique, in_range, in_set,
    matches, foreign_key, check}; ``name`` is the output label."""

    kind: str
    name: str
    cols: tuple[str, ...] = ()
    lo: object = None
    hi: object = None
    values: tuple = ()
    pattern: str | None = None
    ref: DataFrame | None = None
    ref_cols: tuple[str, ...] = ()
    expr: Column | None = field(default=None, compare=False)


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule("not_null", name or f"not_null_{col}", cols=(col,))


def unique(*cols: str, name: str | None = None) -> Rule:
    return Rule("unique", name or "unique_" + "_".join(cols), cols=tuple(cols))


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    """Violation when the value falls outside [lo, hi]. NULLs pass (pair
    with not_null to reject them) — same convention as SQL CHECK."""
    return Rule("in_range", name or f"in_range_{col}", cols=(col,), lo=lo, hi=hi)


def in_set(col: str, values, name: str | None = None) -> Rule:
    return Rule("in_set", name or f"in_set_{col}", cols=(col,), values=tuple(values))


def matches(col: str, pattern: str, name: str | None = None) -> Rule:
    """Violation when the (non-NULL) value does not fully match ``pattern``."""
    return Rule("matches", name or f"matches_{col}", cols=(col,), pattern=pattern)


def foreign_key(
    cols, ref: DataFrame, ref_cols=None, name: str | None = None
) -> Rule:
    cols = (cols,) if isinstance(cols, str) else tuple(cols)
    ref_cols = cols if ref_cols is None else (
        (ref_cols,) if isinstance(ref_cols, str) else tuple(ref_cols)
    )
    return Rule(
        "foreign_key",
        name or "fk_" + "_".join(cols),
        cols=cols,
        ref=ref,
        ref_cols=ref_cols,
    )


def check(expr: Column, name: str) -> Rule:
    """Violation when the boolean ``expr`` is false or NULL."""
    return Rule("check", name, expr=expr)


def _row_violation(rule: Rule) -> Column:
    """Boolean 'this row violates the rule' expression (row-local kinds)."""
    if rule.kind == "not_null":
        return F.col(rule.cols[0]).isNull()
    if rule.kind == "in_range":
        c = F.col(rule.cols[0])
        return c.isNotNull() & ~c.between(F.lit(rule.lo), F.lit(rule.hi))
    if rule.kind == "in_set":
        c = F.col(rule.cols[0])
        return c.isNotNull() & ~c.isin(list(rule.values))
    if rule.kind == "matches":
        c = F.col(rule.cols[0])
        return c.isNotNull() & ~c.rlike(rule.pattern)
    if rule.kind == "check":
        return ~F.coalesce(rule.expr, F.lit(False))
    raise ValueError(f"not a row-local rule: {rule.kind}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns ``(rule string, violations bigint)``,
    one row per rule in a deterministic (input) order via an ``ord`` sort
    key that is dropped — callers see (rule, violations).

    ``unique`` counts rows in excess of one per key (a key seen k times
    contributes k-1); rows with a NULL in any key column are EXCLUDED
    first — SQL UNIQUE-constraint semantics (NULLs never conflict). Pair
    with a ``not_null`` rule to reject NULL keys. ``foreign_key`` counts
    rows whose (non-NULL) key has no match in the reference — NULL keys
    pass, as in SQL FK semantics.

    Rule names are carried only as typed literals (never interpolated
    into SQL), so any string — quotes, backticks, emoji — is a valid
    rule name.
    """
    if not rules:
        raise ValueError("validate() needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    pieces: list[DataFrame] = []
    row_local = [r for r in rules if r.kind not in ("unique", "foreign_key")]
    if row_local:
        # positional aliases keep arbitrary rule names out of identifiers;
        # the unpivot is a typed explode of (name-literal, count) structs —
        # no stack() SQL string to escape
        aggs = [
            F.sum(_row_violation(r).cast("bigint")).alias(f"_v{i}")
            for i, r in enumerate(row_local)
        ]
        one = df.agg(*aggs)
        kv = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.col(f"_v{i}").alias("violations"),
                )
                for i, r in enumerate(row_local)
            ]
        )
        stacked = one.select(F.explode(kv).alias("_kv")).select(
            "_kv.rule", "_kv.violations"
        )
        pieces.append(stacked.select("rule", F.coalesce("violations", F.lit(0)).alias("violations")))

    for r in rules:
        if r.kind == "unique":
            dups = (
                df.na.drop(subset=list(r.cols))  # SQL UNIQUE: NULL keys never conflict
                .groupBy(*r.cols)
                .agg((F.count(F.lit(1)) - F.lit(1)).alias("_extra"))
                .agg(F.coalesce(F.sum("_extra"), F.lit(0)).alias("violations"))
                .select(F.lit(r.name).alias("rule"), "violations")
            )
            pieces.append(dups)
        elif r.kind == "foreign_key":
            keys = df.select(
                *[F.col(c).alias(rc) for c, rc in zip(r.cols, r.ref_cols)]
            ).na.drop()
            refk = r.ref.select(*r.ref_cols).distinct()
            orphans = (
                keys.join(refk, list(r.ref_cols), "left_anti")
                .agg(F.count(F.lit(1)).alias("violations"))
                .select(F.lit(r.name).alias("rule"), "violations")
            )
            pieces.append(orphans)

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.select("rule", F.col("violations").cast("bigint").alias("violations"))


def assert_valid(df: DataFrame, rules: list[Rule], max_violations: int = 0) -> None:
    """Action form: raise ``ValueError`` when total violations exceed the
    budget — the semantic twin of the reference's max_errors circuit
    breaker (etl-job/src/job.rs:258-263) for declarative rules."""
    rows = validate(df, rules).collect()
    total = sum(r["violations"] for r in rows)
    if total > max_violations:
        detail = ", ".join(f"{r['rule']}={r['violations']}" for r in rows if r["violations"])
        raise ValueError(
            f"validation failed: {total} violations (budget {max_violations}): {detail}"
        )
