"""Paired A/B bench between two repo checkouts (VERDICT r7 task #1).

Runs each tree's own ``bench.py`` as a subprocess on the SAME host,
strictly serially, ALTERNATING which side goes first per trial (so slow
host drift averages out of the pairing), with an identical
``SPARK_GRAFT_BENCH_ONLY`` set and identical warm-run / JVM policy. Each
invocation is its own fresh JVM, so both sides see the same JVM age by
construction.

Output: ``BENCH_AB_r08.json`` with per-query per-trial times for both
sides, the paired per-trial ratios, and a median paired ratio — the
number that actually attributes a slowdown to CODE (same-host, same-time,
same-harness) rather than to host generation/load or harness protocol.

Usage:
    python tools/ab_bench.py --a /tmp/r6 --b /root/repo \
        --queries q1_pricing_summary,... --trials 3 \
        --out BENCH_AB_r08.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def run_bench(tree: str, queries: list[str], sf_dir: str, runs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(queries)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    # both sides: recycle policy irrelevant at this query count, but pin
    # it identically anyway (r6's bench ignores the unknown var)
    env["SPARK_GRAFT_BENCH_RESTART"] = "40"
    # identical protocol on both sides: no history comparison, no
    # isolation re-runs (r7's bench honors this; the r6 worktree's
    # history file is blanked to the same effect)
    env["SPARK_GRAFT_BENCH_NO_HISTORY"] = "1"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    wall = round(time.time() - t0, 1)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"bench.py failed in {tree}")
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    out["_wall_sec"] = wall
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="side A tree (e.g. r6 worktree)")
    ap.add_argument("--b", required=True, help="side B tree (e.g. current repo)")
    ap.add_argument("--a-name", default="r6")
    ap.add_argument("--b-name", default="r7")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="BENCH_AB_r08.json")
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]

    trials: list[dict] = []
    for t in range(args.trials):
        order = (
            [(args.a_name, args.a), (args.b_name, args.b)]
            if t % 2 == 0
            else [(args.b_name, args.b), (args.a_name, args.a)]
        )
        trial: dict = {"order": [n for n, _ in order]}
        for name, tree in order:
            try:
                load1 = os.getloadavg()[0]
            except OSError:
                load1 = -1.0
            print(
                f"# trial {t} side {name} (loadavg {load1:.2f}) ...",
                file=sys.stderr,
                flush=True,
            )
            res = run_bench(tree, queries, args.sf_dir, args.runs)
            trial[name] = {
                "queries": res["queries"],
                "total": res["value"],
                "wall_sec": res["_wall_sec"],
                "loadavg_at_start": round(load1, 2),
                "cpu_probe_sec": (res.get("host_load") or {}).get(
                    "cpu_probe_sec"
                ),
            }
            print(
                f"# trial {t} side {name}: total {res['value']:.1f}s "
                f"(wall {res['_wall_sec']}s)",
                file=sys.stderr,
                flush=True,
            )
        trials.append(trial)

    # paired per-trial ratios b/a, then per-query median over trials
    per_query: dict[str, dict] = {}
    for q in queries:
        a_times = [tr[args.a_name]["queries"].get(q) for tr in trials]
        b_times = [tr[args.b_name]["queries"].get(q) for tr in trials]
        pairs = [
            round(b / a, 3)
            for a, b in zip(a_times, b_times)
            if a and b and a > 0
        ]
        per_query[q] = {
            args.a_name: a_times,
            args.b_name: b_times,
            "paired_ratios": pairs,
            "median_ratio": round(statistics.median(pairs), 3) if pairs else None,
            f"{args.a_name}_median": round(
                statistics.median([x for x in a_times if x is not None]), 3
            ),
            f"{args.b_name}_median": round(
                statistics.median([x for x in b_times if x is not None]), 3
            ),
        }

    med_of_meds = statistics.median(
        v["median_ratio"] for v in per_query.values() if v["median_ratio"]
    )
    out = {
        "protocol": {
            "a": {"name": args.a_name, "tree": args.a},
            "b": {"name": args.b_name, "tree": args.b},
            "trials": args.trials,
            "warm_runs": args.runs,
            "sf_dir": args.sf_dir,
            "interleaved": "alternating first-runner per trial, strictly serial",
        },
        "per_query": per_query,
        "median_paired_ratio": round(med_of_meds, 3),
        "trials_raw": trials,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}; median paired ratio "
          f"{args.b_name}/{args.a_name} = {med_of_meds:.3f}")
    flagged = {
        q: v["median_ratio"]
        for q, v in per_query.items()
        if v["median_ratio"] and v["median_ratio"] >= 1.3
    }
    print(f"code-attributed >=1.3x: {json.dumps(flagged, sort_keys=True)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
