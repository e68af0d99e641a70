"""Schema conformance for drifting inputs.

The reference pins record shape at compile time with serde structs —
field renames via ``rename_all = "camelCase"`` attributes
(etl-job/tests/simple-pipeline.rs:133), missing optional fields as
``Option<T>``, unknown fields silently dropped by serde. A dynamic
engine meets the same needs at runtime: conform whatever a source
delivered to the schema downstream code expects, deterministically, and
say what was changed.

All pure projection — column renames/casts/literal-NULL fills compile to
one narrow codegen stage, no shuffle, no Python; safe to prepend to any
100 TB scan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def camel_to_snake(name: str) -> str:
    """``orderDate`` → ``order_date`` (the inverse of serde's
    ``rename_all = "camelCase"``)."""
    return re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", name).lower()


def snake_to_camel(name: str) -> str:
    head, *rest = name.split("_")
    return head + "".join(w.capitalize() for w in rest if w)


@dataclass
class ConformReport:
    renamed: dict[str, str] = field(default_factory=dict)
    cast: dict[str, tuple[str, str]] = field(default_factory=dict)  # col -> (from, to)
    filled: list[str] = field(default_factory=list)  # missing -> NULL literal
    dropped: list[str] = field(default_factory=list)  # extra input columns
    missing_required: list[str] = field(default_factory=list)  # non-nullable absent


def conform_schema(
    df: DataFrame,
    target: StructType,
    rename: dict[str, str] | None = None,
    case_insensitive: bool = True,
    auto_camel: bool = True,
    drop_extra: bool = True,
    strict: bool = True,
) -> tuple[DataFrame, ConformReport]:
    """Project ``df`` onto ``target``: match columns by explicit
    ``rename`` map, then exact name, then case-insensitive name, then
    camelCase↔snake_case folding; cast matched columns to the target
    type; fill absent nullable fields with typed NULLs; drop (or keep,
    ``drop_extra=False``) unmatched input columns.

    Returns ``(conformed_df, report)``. A non-nullable target field with
    no source column raises (``strict=True``) or lands in
    ``report.missing_required``. Output column order == target order —
    unions across conformed shards line up positionally.
    """
    rename = rename or {}
    rep = ConformReport()
    by_exact = {c: c for c in df.columns}
    by_fold: dict[str, str] = {}
    for c in df.columns:
        if case_insensitive:
            by_fold.setdefault(c.lower(), c)
        if auto_camel:
            by_fold.setdefault(camel_to_snake(c).lower(), c)

    used: set[str] = set()
    cols = []
    for f_ in target.fields:
        src = None
        if f_.name in rename:
            src = rename[f_.name]
            if src not in by_exact:
                raise ValueError(f"rename source {src!r} not in input columns")
        elif f_.name in by_exact:
            src = f_.name
        else:
            for key in (f_.name.lower(), camel_to_snake(f_.name).lower()):
                if key in by_fold:
                    src = by_fold[key]
                    break
        if src is None:
            if not f_.nullable and strict:
                raise ValueError(
                    f"required target column {f_.name!r} has no source match"
                )
            if not f_.nullable:
                rep.missing_required.append(f_.name)
            rep.filled.append(f_.name)
            cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
            continue
        used.add(src)
        src_type = df.schema[src].dataType
        expr = F.col(src)
        if src != f_.name:
            rep.renamed[src] = f_.name
        if src_type != f_.dataType:
            rep.cast[f_.name] = (src_type.simpleString(), f_.dataType.simpleString())
            expr = expr.cast(f_.dataType)
        cols.append(expr.alias(f_.name))

    extras = [c for c in df.columns if c not in used]
    if drop_extra:
        rep.dropped = extras
    else:
        cols.extend(F.col(c) for c in extras)
    return df.select(*cols), rep
