"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall-clock seconds.

Execution is forced with the noop sink (full plan runs, nothing collected
to the driver) so timings measure the distributed plan, not result
transfer.

Protocol: each query executes twice; the reported time is the second
(steady-state) run, which measures the distributed plan itself rather than
one-time driver costs (Catalyst codegen compilation, parquet footer reads,
page-cache faults) that are amortized across a real cluster workload. The
first-run total is still reported as ``cold_total_sec`` for transparency.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: relational core + joins + windows + the extension ops that
# matter at scale (dedup / similarity / text / sessionize)
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "agg_distinct",
    "window_running_total",
    "topk_orders",
    "j1_left_theta_join",
    "q13_customer_distribution",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "asof_join_events_orders",
    "t4_batch_by_count",
    "events_hourly_agg",
    "events_sessionize",
    "text_analyze",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine_brute",
    "winnow_fingerprint",
    "range_join_order_pairs",
    "kmv_distinct_users",
    "hash_split_documents",
    # round-2 scale ops
    "bloom_semi_join_lineitem",
    "pack_concat_documents",
    "mixture_sample_documents",
    "profile_orders",
    "validate_orders",
    "histogram_totalprice",
    "quantiles_totalprice_hist",
    "bigram_pmi_documents",
    "keyword_search_documents",
    "incremental_orders_state",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from etl_tools_rs_spark.queries import REGISTRY
    from etl_tools_rs_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM/codegen/parquet-footer costs land here, not on q1
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(
            f"# {name}: {timings[name]:.2f}s (cold {cold[name]:.2f}s)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cold_total_sec": round(sum(cold.values()), 3),
                # metric protocol marker: "value" is the warm (second) run
                # since round 1; compare rounds on the same protocol, or
                # use cold_total_sec for the cold-start view
                "protocol": "warm-second-run",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
