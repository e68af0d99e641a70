"""End-to-end example: corpus GOVERNANCE — the audit → redact → erase
loop that makes a training corpus shippable.

Companion to examples/training_data_pipeline.py (filter/dedup/pack) and
mixture_pipeline.py (domain balance): this one exercises the compliance
ops that decide whether the corpus may leave the building at all:

1. audit   — k_anonymity_summary over the customer dimension: how
             re-identifiable are quasi-identifier combinations?
             (Sweeney 2002; the verdict gates the release)
2. redact  — pii_redact over document text: emails/phones/ids out
3. erase   — propagate_deletes: a right-to-be-forgotten request for a
             set of customers cascades customer → orders → lineitem
             with broadcast semi/anti joins (zero fact-table shuffles),
             and the purge report lands in the job state

Every step is a resumable JobRunner command with its row count in the
job state — re-running the script skips completed steps.

Run:  python examples/governance_pipeline.py [workdir] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(workdir: str | None = None, sf_dir: str | None = None) -> int:
    from etl_tools_rs_spark.jobs.runner import JobRunner
    from etl_tools_rs_spark.operators.privacy import (
        k_anonymity_summary,
        propagate_deletes,
    )
    from etl_tools_rs_spark.operators.text import pii_redact
    from etl_tools_rs_spark.session import get_spark
    from etl_tools_rs_spark.sinks.simple_store import SimpleStore

    work = workdir or tempfile.mkdtemp(prefix="governance_pipeline_")
    sf = sf_dir or "/root/testdata/sf0.001"
    spark = get_spark("governance-example", shuffle_partitions=8)

    jr = JobRunner(
        "example-6", "governance", SimpleStore(f"{work}/state"),
        max_errors=0, stop_on_error=True,
    )
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def audit(_jr):
        verdict = k_anonymity_summary(
            cust,
            ["c_nationkey", "c_mktsegment"],
            k_min=5,
            sensitive_col="c_acctbal",
            l_min=3,
        )
        verdict.write.mode("overwrite").parquet(f"{work}/k_anonymity")
        return verdict.count()

    jr.run_cmd("audit_k_anonymity", audit)

    def redact(_jr):
        clean = docs.withColumn("text", pii_redact("text"))
        clean.write.mode("overwrite").parquet(f"{work}/redacted_docs")
        return clean.count()

    jr.run_cmd("redact_pii", redact)

    def erase(_jr):
        # the right-to-be-forgotten request: the five lowest-balance
        # customers stand in for real deletion tickets (deterministic
        # and non-empty at any SF, unlike a fixed threshold)
        seed = (
            cust.orderBy("c_acctbal", "c_custkey")
            .limit(5)
            .select("c_custkey")
        )
        cascade = propagate_deletes(
            tables={
                "customer": cust,
                "orders": orders,
                "lineitem": lineitem,
            },
            keys={
                "customer": "c_custkey",
                "orders": "o_orderkey",
                "lineitem": "l_orderkey",
            },
            seed_table="customer",
            seed_keys=seed,
            edges=[
                ("orders", "o_custkey", "customer"),
                ("lineitem", "l_orderkey", "orders"),
            ],
        )
        for name, surv in cascade.survivors.items():
            surv.write.mode("overwrite").parquet(f"{work}/clean/{name}")
        report = cascade.report.orderBy("table")
        report.write.mode("overwrite").parquet(f"{work}/purge_report")
        return report.count()

    jr.run_cmd("erase_forgotten", erase)
    state = jr.complete()

    report = {
        r["table"]: {"purged": r["purged"], "kept": r["kept"]}
        for r in spark.read.parquet(f"{work}/purge_report").collect()
    }
    print(
        json.dumps(
            {
                "workdir": work,
                "purge_report": report,
                "steps": {
                    name: s.status for name, s in state.step_history.items()
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else None,
            sys.argv[2] if len(sys.argv) > 2 else None,
        )
    )
