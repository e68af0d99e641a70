"""End-to-end example: constructing a training MIXTURE — the
measure → weight → allocate → cap → draw loop that fixes a corpus'
domain balance before any tokens are packed.

Companion to examples/training_data_pipeline.py (filter/dedup/pack/
shard) and curation_models_pipeline.py (classifier/tokenizer/split):
this one exercises the ops that decide HOW MUCH of each source to
train on:

1. measure   — concentration_profile: is the mix dominated by a few
               sources? (Gini + top-10% share of bytes)
2. weight    — temperature_rates: α-tempered shares upweight the tail
3. allocate  — budget_allocate: water-fill a document budget across
               sources by those weights, capped by availability
4. cap+draw  — mixture_sample at the per-source rates implied by the
               allocation (deterministic content-hash draw), then
               cap_per_group as the hard per-source ceiling

Every step is a resumable JobRunner command with its row count in the
job state — re-running the script skips completed steps.

Run:  python examples/mixture_pipeline.py [workdir] [sf_dir]
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
    from etl_tools_rs_spark.operators.profile import concentration_profile
    from etl_tools_rs_spark.operators.sample import (
        budget_allocate,
        cap_per_group,
        mixture_sample,
        temperature_rates,
    )
    from etl_tools_rs_spark.session import get_spark
    from etl_tools_rs_spark.sinks.simple_store import SimpleStore

    work = workdir or tempfile.mkdtemp(prefix="mixture_pipeline_")
    sf = sf_dir or "/root/testdata/sf0.001"
    spark = get_spark("mixture-example", shuffle_partitions=8)

    jr = JobRunner(
        "example-3", "mixture", SimpleStore(f"{work}/state"),
        max_errors=0, stop_on_error=True,
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    budget = max(10.0, docs.count() * 0.4)  # take ~40% of the corpus

    def measure(_jr):
        prof = concentration_profile(
            docs, "n_chars", by=["source"], top_fracs=(0.1,)
        )
        prof.write.mode("overwrite").parquet(f"{work}/concentration")
        return prof.count()

    jr.run_cmd("measure_concentration", measure)

    def allocate(_jr):
        rates = temperature_rates(docs, "source", alpha=0.6)
        domains = (
            docs.groupBy(F.col("source").alias("grp"))
            .agg(F.count(F.lit(1)).cast("double").alias("avail"))
            .join(rates.select("grp", "share"), "grp")
        )
        alloc = budget_allocate(domains, "avail", "share", budget)
        alloc.write.mode("overwrite").parquet(f"{work}/allocation")
        return alloc.count()

    jr.run_cmd("allocate_budget", allocate)

    def draw(_jr):
        alloc = spark.read.parquet(f"{work}/allocation")
        # per-source keep-rate implied by the allocation
        rate_rows = alloc.select(
            "grp", (F.col("alloc") / F.col("avail")).alias("rate")
        ).collect()  # source-count-sized metadata
        rates = {r.grp: min(1.0, r.rate) for r in rate_rows}
        drawn = mixture_sample(docs, "source", "doc_id", rates)
        # hard ceiling regardless of rates (defense in depth for
        # pathological sources)
        capped = cap_per_group(
            drawn, by=["source"], k=int(budget), key_col="doc_id"
        )
        capped.write.mode("overwrite").parquet(f"{work}/mixture")
        return capped.count()

    n_final = jr.run_cmd("draw_mixture", draw)
    state = jr.complete()

    print(
        json.dumps(
            {
                "workdir": work,
                "budget": budget,
                "drawn": n_final,
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
