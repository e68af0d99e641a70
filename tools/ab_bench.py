"""Paired A/B bench between two repo checkouts.

Two modes, same host, strictly serial measurement:

``--mode sweep`` (r8): each trial runs each tree's own ``bench.py`` as a
subprocess over the full query set, ALTERNATING which side goes first
per trial. Robust to order effects but NOT to hour-scale host drift —
the whole A sweep finishes before the B sweep starts, so a host window
that spans one sweep aliases straight into the paired ratio (observed
r8: one side's sweep ran 646s vs the same code's 346s record the same
day).

``--mode per-query`` (r9, VERDICT r8 task #2): one persistent
``tools/bench_serve.py`` process per tree (identical serve harness,
only the engine import differs); each query is measured back-to-back on
both sides — seconds apart, not a sweep apart — with the side order
alternating per (query index + trial). Host drift slower than a few
query-lengths hits both sides alike and divides out of the per-query
paired ratio. Both sides' sessions recycle at the SAME indices
(``--recycle-every``, default 40 = the bench.py sweep policy) so JVM
age stays matched by construction.

Null calibration: point ``--a`` and ``--b`` at the SAME tree (or two
checkouts of the same commit). The resulting per-query ratio spread is
the instrument's noise band; a real A/B claim is only as strong as its
excess over the null band (VERDICT r8 task #2: the band artifact is
committed as ``BENCH_AB_r09_null.json``).

Process hygiene (r9): the null run exposed a second noise mechanism —
one serve PROCESS goes bad and STAYS bad across session recycles
(``multimodal_png_pipeline``: 11.8s on one side across recycles while
the other held 0.7-1.2s, same code). ``spark.stop()`` + ``getOrCreate``
reuses the same JVM gateway, so JVM/python-worker degradation survives
a recycle; neither order alternation nor back-to-back pairing cancels a
one-process funk. ``--restart-processes trial`` (the default) therefore
kills and respawns BOTH serve OS processes between trials — a funk can
bias at most one trial, and the per-query MEDIAN over >=3 trials votes
it out. ``--restart-processes never`` restores the r9-null behavior for
instrument-to-instrument comparisons.

The requested query list is validated against BOTH trees' registries
BEFORE any measurement (ADVICE r8: a typo'd name used to surface as an
IndexError only after all trials finished).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

SERVE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_serve.py")


def registry_names(tree: str) -> list[str]:
    """The tree's registry names, via a Spark-free import probe."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import json, sys; sys.path.insert(0, '.');"
            "from etl_tools_rs_spark.queries import REGISTRY;"
            "print(json.dumps(list(REGISTRY)))",
        ],
        cwd=tree,
        capture_output=True,
        text=True,
        timeout=300,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"registry probe failed in {tree}:\n{proc.stderr[-2000:]}"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def validate_queries(queries: list[str], sides: list[tuple[str, str]]) -> None:
    for name, tree in sides:
        known = set(registry_names(tree))
        missing = [q for q in queries if q not in known]
        if missing:
            raise SystemExit(
                f"queries not in {name} ({tree}) registry: {missing}"
            )


def run_bench(tree: str, queries: list[str], sf_dir: str, runs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(queries)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    env["SPARK_GRAFT_BENCH_RESTART"] = "40"
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
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if not json_lines:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError(f"bench.py in {tree} emitted no JSON result line")
    out = json.loads(json_lines[-1])
    out["_wall_sec"] = wall
    return out


class Serve:
    """One persistent bench_serve.py subprocess (stdout = protocol only;
    stderr appended to a side log)."""

    def __init__(self, name: str, tree: str, sf_dir: str, runs: int, log_dir: str):
        self.name = name
        self.tree = tree
        self.log = open(os.path.join(log_dir, f"ab_serve_{name}.log"), "ab")
        self.proc = subprocess.Popen(
            [sys.executable, SERVE, "--tree", tree, "--sf-dir", sf_dir,
             "--runs", str(runs)],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=self.log,
            text=True,
            bufsize=1,
        )
        self.queries = self._wait("READY ")["queries"]

    def _wait(self, prefix: str) -> dict:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(
                    f"serve[{self.name}] died (see its ab_serve log)"
                )
            line = line.strip()
            if line.startswith(prefix):
                return json.loads(line[len(prefix):]) if line[len(prefix):] else {}
            if line.startswith("ERROR "):
                raise RuntimeError(f"serve[{self.name}]: {line}")

    def send(self, cmd: str) -> None:
        self.proc.stdin.write(cmd + "\n")
        self.proc.stdin.flush()

    def run(self, query: str) -> dict:
        self.send(f"RUN {query}")
        return self._wait("RESULT ")

    def recycle(self) -> None:
        self.send("RECYCLE")
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"serve[{self.name}] died during recycle")
            if line.strip() == "RECYCLED":
                return

    def close(self) -> None:
        try:
            self.send("EXIT")
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()
        self.log.close()


def summarize(
    queries: list[str], trials: list[dict], a_name: str, b_name: str
) -> tuple[dict, float]:
    per_query: dict[str, dict] = {}
    for q in queries:
        a_times = [tr[a_name]["queries"].get(q) for tr in trials]
        b_times = [tr[b_name]["queries"].get(q) for tr in trials]
        pairs = [
            round(b / a, 3)
            for a, b in zip(a_times, b_times)
            if a and b and a > 0
        ]
        a_ok = [x for x in a_times if x is not None]
        b_ok = [x for x in b_times if x is not None]
        per_query[q] = {
            a_name: a_times,
            b_name: b_times,
            "paired_ratios": pairs,
            "median_ratio": round(statistics.median(pairs), 3) if pairs else None,
            f"{a_name}_median": round(statistics.median(a_ok), 3) if a_ok else None,
            f"{b_name}_median": round(statistics.median(b_ok), 3) if b_ok else None,
        }
    meds = [v["median_ratio"] for v in per_query.values() if v["median_ratio"]]
    if not meds:
        raise RuntimeError("no successful paired measurements — see serve logs")
    return per_query, statistics.median(meds)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="side A tree")
    ap.add_argument("--b", required=True, help="side B tree")
    ap.add_argument("--a-name", default="a")
    ap.add_argument("--b-name", default="b")
    ap.add_argument("--queries", required=True,
                    help="comma list, or 'all' = side B registry order")
    ap.add_argument("--mode", choices=["sweep", "per-query"], default="sweep")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--recycle-every", type=int, default=40,
                    help="per-query mode: recycle BOTH sessions every N "
                         "queries (matched JVM age)")
    ap.add_argument("--restart-processes", choices=["trial", "never"],
                    default="trial",
                    help="per-query mode: kill + respawn both serve OS "
                         "processes between trials (default), so a "
                         "degraded JVM/python-worker process can bias at "
                         "most one trial; 'never' keeps one process pair "
                         "for the whole campaign (r9-null behavior)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="BENCH_AB.json")
    args = ap.parse_args()

    sides = [(args.a_name, args.a), (args.b_name, args.b)]
    if args.queries == "all":
        b_known = registry_names(args.b)
        a_known = set(registry_names(args.a))
        queries = [q for q in b_known if q in a_known]
        skipped = [q for q in b_known if q not in a_known]
        if skipped:
            print(f"# skipping (not in side A): {skipped}", file=sys.stderr)
    else:
        queries = [q for q in args.queries.split(",") if q]
        validate_queries(queries, sides)

    trials: list[dict] = []
    if args.mode == "per-query":
        serves: dict[str, Serve] = {}

        def spawn_serves() -> None:
            for s in serves.values():
                s.close()
            serves.clear()
            for name, tree in sides:
                serves[name] = Serve(name, tree, args.sf_dir, args.runs, "/tmp")

        spawn_serves()
        try:
            since_recycle = 0
            for t in range(args.trials):
                if t > 0 and args.restart_processes == "trial":
                    # fresh OS processes (new JVM gateway + python workers):
                    # a process that went bad in trial t-1 cannot leak in
                    print(
                        f"# trial {t}: restarting serve processes",
                        file=sys.stderr,
                        flush=True,
                    )
                    spawn_serves()
                    since_recycle = 0
                trial: dict = {
                    "order": "per-query ABBA (first side = "
                    "A if (qi + trial) even)",
                    args.a_name: {"queries": {}, "cold": {}},
                    args.b_name: {"queries": {}, "cold": {}},
                }
                for qi, q in enumerate(queries):
                    if since_recycle >= args.recycle_every > 0:
                        for s in serves.values():
                            s.recycle()
                        since_recycle = 0
                    first = args.a_name if (qi + t) % 2 == 0 else args.b_name
                    second = args.b_name if first == args.a_name else args.a_name
                    for side in (first, second):
                        try:
                            res = serves[side].run(q)
                        except RuntimeError as exc:
                            print(f"# {side} {q}: {exc}", file=sys.stderr)
                            continue
                        trial[side]["queries"][q] = res["warm_median"]
                        trial[side]["cold"][q] = res["cold"]
                    since_recycle += 1
                    a_t = trial[args.a_name]["queries"].get(q)
                    b_t = trial[args.b_name]["queries"].get(q)
                    ratio = (
                        f"{b_t / a_t:.3f}" if a_t and b_t and a_t > 0 else "n/a"
                    )
                    print(
                        f"# trial {t} [{qi + 1}/{len(queries)}] {q}: "
                        f"{args.a_name} {a_t}s {args.b_name} {b_t}s "
                        f"ratio {ratio} (first={first})",
                        file=sys.stderr,
                        flush=True,
                    )
                for side in (args.a_name, args.b_name):
                    trial[side]["total"] = round(
                        sum(trial[side]["queries"].values()), 3
                    )
                for name, s in serves.items():
                    trial[name]["serve_pid"] = s.proc.pid
                trials.append(trial)
                if args.restart_processes == "never":
                    # fresh JVMs between trials, both sides together
                    for s in serves.values():
                        s.recycle()
                    since_recycle = 0
        finally:
            for s in serves.values():
                s.close()
    else:
        for t in range(args.trials):
            order = sides if t % 2 == 0 else sides[::-1]
            trial = {"order": [n for n, _ in order]}
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

    per_query, med_of_meds = summarize(
        queries, trials, args.a_name, args.b_name
    )
    out = {
        "protocol": {
            "mode": args.mode,
            "a": {"name": args.a_name, "tree": args.a},
            "b": {"name": args.b_name, "tree": args.b},
            "trials": args.trials,
            "warm_runs": args.runs,
            "sf_dir": args.sf_dir,
            "recycle_every": args.recycle_every
            if args.mode == "per-query"
            else None,
            "restart_processes": args.restart_processes
            if args.mode == "per-query"
            else None,
            "interleaved": (
                "per-query back-to-back, side order alternating by "
                "(query index + trial), matched recycle indices"
                if args.mode == "per-query"
                else "alternating first-runner per trial, strictly serial"
            ),
        },
        "per_query": per_query,
        "median_paired_ratio": round(med_of_meds, 3),
        "trials_raw": trials,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"wrote {args.out}; median paired ratio "
        f"{args.b_name}/{args.a_name} = {med_of_meds:.3f}"
    )
    flagged = {
        q: v["median_ratio"]
        for q, v in per_query.items()
        if v["median_ratio"] and v["median_ratio"] >= 1.3
    }
    print(f"per-query median >=1.3x: {json.dumps(flagged, sort_keys=True)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
