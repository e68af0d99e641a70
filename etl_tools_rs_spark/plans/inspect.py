"""Physical-plan inspection: programmatic checks that the plan we got is
the plan we want (pushdown reached the scan, joins broadcast, codegen
covers the hot path). Used by tests to pin plan shapes so regressions that
would only show up at 100 TB fail at unit-test scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    text: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    has_broadcast_join: bool = False
    has_sortmerge_join: bool = False
    has_bnl_join: bool = False
    num_exchanges: int = 0
    wholestage_codegen_stages: int = 0
    has_python_udf: bool = False

    def scan_reads_only(self, cols: set[str]) -> bool:
        """True if every parquet scan's ReadSchema is a subset of ``cols`` —
        the column-pruning check."""
        for rs in self.read_schemas:
            read = set(re.findall(r"(\w+):", rs))
            if not read.issubset(cols):
                return False
        return True


def plan_report(df: DataFrame, execute: bool = False) -> PlanReport:
    """``execute=True`` collects the frame first so AQE finalizes — codegen
    stage markers and runtime join choices only exist on the final adaptive
    plan, and only on THIS df's QueryExecution (a write action would build
    its own). Test/small-frame use only: results land on the driver."""
    if execute:
        df.collect()
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    # the simple plan carries the codegen-stage markers `*(n)`; formatted
    # mode does not print WholeStageCodegen nodes in Spark 4
    simple = df._jdf.queryExecution().executedPlan().toString()
    rep = PlanReport(text=text)
    rep.wholestage_codegen_stages = len(set(re.findall(r"\*\((\d+)\)", simple)))
    rep.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    rep.read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", text)
    rep.joins = re.findall(r"(\w*Join\w*)", text)
    rep.has_broadcast_join = "BroadcastHashJoin" in text
    rep.has_sortmerge_join = "SortMergeJoin" in text
    rep.has_bnl_join = "BroadcastNestedLoopJoin" in text
    # formatted mode prints each node twice (tree line + numbered detail);
    # count the numbered detail entries so each shuffle counts once
    rep.num_exchanges = len(re.findall(r"\(\d+\) Exchange\b", text))
    rep.has_python_udf = "BatchEvalPython" in text or "ArrowEvalPython" in text
    return rep
