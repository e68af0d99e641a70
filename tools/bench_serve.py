"""Persistent per-tree bench server for the per-query interleaved A/B
(`tools/ab_bench.py --mode per-query`, VERDICT r8 task #2).

Whole-sweep alternation aliases hour-scale host drift into the paired
ratio (r8: trial 1's r8-side sweep ran 646s vs the same code's 346s
record the same day). The fix is pairing at QUERY granularity: both
trees measure the same query seconds apart, so any host window hits A
and B alike and divides out of the ratio. That requires both trees'
JVMs to stay alive across queries — this server wraps ONE tree:

    python tools/bench_serve.py --tree /tmp/r7 --sf-dir ... --runs 3

It imports the TREE's engine (``sys.path`` pinned to the tree, so the
serve protocol is identical-by-construction on both sides while only
the engine code differs), warms up exactly like ``bench.py``'s
``fresh_session``, then answers a line protocol on stdin/stdout:

    LIST            -> ``READY {"queries": [...]}`` (registry names)
    RUN <query>     -> one cold + ``--runs`` warm runs (noop sink, same
                       as bench.py), ``RESULT {"query":..., "cold":...,
                       "warm_median":..., "warm": [...]}``
    RECYCLE         -> stop the session, gc, fresh session; ``RECYCLED``
    EXIT / EOF      -> quit

stdout carries ONLY protocol lines (Spark logs/progress go to stderr),
every line is flushed, and timings use the same cold+warm-median and
clearCache+gc hygiene as ``bench.py`` so serve-mode numbers are
comparable with sweep-mode ones.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", required=True, help="repo checkout to serve")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    tree = os.path.abspath(args.tree)

    # the tree's engine, not the orchestrator's: path pinned BEFORE import
    sys.path.insert(0, tree)
    os.chdir(tree)
    from etl_tools_rs_spark.queries import REGISTRY  # noqa: E402
    from etl_tools_rs_spark.session import get_spark  # noqa: E402

    def say(line: str) -> None:
        sys.stdout.write(line + "\n")
        sys.stdout.flush()

    def fresh_session():
        s = get_spark("bench-serve")
        s.sparkContext.setLogLevel("ERROR")
        s.range(1_000_000).selectExpr("sum(id)").collect()
        for t in ("region", "orders", "documents", "embeddings"):
            if os.path.exists(f"{args.sf_dir}/{t}.parquet"):
                s.read.parquet(f"{args.sf_dir}/{t}.parquet").count()
                break
        return s

    spark = fresh_session()
    say("READY " + json.dumps({"queries": list(REGISTRY), "tree": tree}))

    for raw in sys.stdin:
        cmd = raw.strip()
        if not cmd:
            continue
        if cmd == "EXIT":
            break
        if cmd == "LIST":
            say("READY " + json.dumps({"queries": list(REGISTRY), "tree": tree}))
            continue
        if cmd == "RECYCLE":
            spark.stop()
            gc.collect()
            spark = fresh_session()
            say("RECYCLED")
            continue
        if cmd.startswith("RUN "):
            name = cmd[4:].strip()
            if name not in REGISTRY:
                say("ERROR " + json.dumps({"query": name, "err": "unknown query"}))
                continue
            fn = REGISTRY[name].fn
            try:
                t0 = time.time()
                fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                cold = round(time.time() - t0, 3)
                samples = []
                for _ in range(args.runs):
                    t0 = time.time()
                    fn(spark, args.sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    samples.append(time.time() - t0)
            except Exception as exc:  # report, don't die mid-campaign
                say("ERROR " + json.dumps({"query": name, "err": repr(exc)[:500]}))
                continue
            spark.catalog.clearCache()
            gc.collect()
            say(
                "RESULT "
                + json.dumps(
                    {
                        "query": name,
                        "cold": cold,
                        "warm_median": round(statistics.median(samples), 3),
                        "warm": [round(s, 3) for s in samples],
                    }
                )
            )
            continue
        say("ERROR " + json.dumps({"err": f"unknown command {cmd[:80]!r}"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
