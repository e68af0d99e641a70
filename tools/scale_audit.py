"""Mechanical scale audit: explain EVERY registry query and flag plan
shapes that break at 100 TB — the sweep version of the targeted pins in
tests/test_plans.py.

Flags per query:
- ``single_partition_window``: a window/sort over SinglePartition
  (global ordering through one task — the classic scale-killer);
- ``cartesian``: CartesianProduct in the physical plan;
- ``bnl_join``: BroadcastNestedLoopJoin (quadratic unless one side is
  genuinely tiny);
- ``python_row_udf``: row-at-a-time BatchEvalPython (non-Arrow Python);
- ``global_limit_sort``: Sort + GlobalLimit without TakeOrderedAndProject;
- ``broadcast_above_generate`` (FATAL since r7): a broadcast join
  whose build side is a Generate (explode) with no cardinality-
  bounding Aggregate/Limit in between. Catalyst's size estimate for
  Generate is its CHILD's size — it cannot see the fan-out — so the
  broadcast decision rests on a structurally understated estimate and
  can ship an O(keys-per-row)× frame to every executor (the r5 fuzzy
  mis-plan: an 8.5M-row exploded deletion-key frame broadcast at sf3,
  serializing the verify onto the 8-task scan stage). r7 closed the
  advisory era: every candidate join fed by a data-dependent or
  corpus-sized explode is pinned ``shuffle_hash`` at the operator
  (dedup_minhash_lsh / simhash_near_dup / negative_sample /
  salted_join / range_join / overlap_join — mirrored by plan-pin
  tests in tests/test_plans.py), and the remaining deliberate
  explode-broadcasts are allowlisted below with their contracts: each
  has a PLAN-TIME-CONSTANT fan-out (bands / num_tables / n_probe), so
  the understatement is bounded by that constant × the broadcast
  threshold, and each broadcasts the side its documented contract
  says is small. Aggregate-bounded paths (vocab-sized idf/df frames
  above a token explode) do not flag: the aggregate bounds actual
  rows to group count, which is the operator's documented broadcast
  contract.

Known-justified sites are allowlisted with the reason printed next to
them (labeled brute-force baselines, reference-parity theta join). The
audit fails (exit 1) on any NON-allowlisted hit, so a new scale smell in
any future operator turns the build red mechanically.

Usage: python tools/scale_audit.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import re
import sys

# resolve the repo root from THIS file, not the cwd, so the
# __spark_entry__ import inside main_with works from any invocation
# directory (r7, ADVICE fix)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# advisory markers: recorded in the artifact (diff-visible) but never a
# violation. Empty since r7 — broadcast_above_generate graduated to a
# fatal flag once every un-contracted site got a shuffle_hash pin.
ADVISORY: set[str] = set()

# query -> (marker -> reason) documented exceptions
ALLOWLIST: dict[str, dict[str, str]] = {
    "knn_cosine_brute": {
        "cartesian": "labeled brute-force correctness baseline; scale paths are knn_cosine_lsh / knn_cosine_ivf",
        "bnl_join": "broadcast queries side — the documented baseline shape",
    },
    "mmr_rerank_embeddings": {
        "bnl_join": "pool construction reuses knn_brute's broadcast-queries crossJoin (3-row side); the rerank itself is a pool-bounded applyInPandas",
    },
    "j1_left_theta_join": {
        "bnl_join": "reference-parity theta join (BNLJ is the only general theta strategy; docstring requires broadcast_right at scale)",
    },
    "fuzzy_name_pairs": {
        "bnl_join": "short-string bucket fallback (length<=d strings join by length band, bounded rows) + the 1-row LCP stats attach (scalar broadcast)",
    },
    "dedup_token_jaccard": {
        "bnl_join": "labeled single-block EXACT verification path; the scale path is the blocked/prefix-filtered variants",
    },
    "knn_cosine_lsh": {
        "broadcast_above_generate": "EXPLICIT F.broadcast of the QUERY side (similarity.py::knn_lsh) — the ANN serving contract is query batch ≪ corpus, and the Generate fan-out is the plan-time constant num_tables, so the broadcast size is bounded at num_tables × |queries|; shuffling the ×num_tables corpus side instead would be the scale regression",
    },
    "knn_cosine_ivf": {
        "broadcast_above_generate": "EXPLICIT F.broadcast of the QUERY side (similarity.py::knn_ivf) — same serving contract as knn_cosine_lsh with plan-constant fan-out n_probe; the corpus inverted file must never shuffle per query batch",
    },
    "incremental_near_dup_documents": {
        "broadcast_above_generate": "the O(delta) contract (lsh_index.py::incremental_near_dup): delta band rows (plan-constant ×bands fan-out) broadcast against the persisted index so the corpus store is only map-side-filtered — a shuffle pin here would defeat the operator's reason to exist; honest pre-Generate estimates flip big deltas to shuffles at ×bands worst-case understatement",
    },
    "cross_near_dup_documents": {
        "broadcast_above_generate": "documented decontamination contract (dedup.py::minhash_cross_pairs): the benchmark-side band table (plan-constant ×bands fan-out) broadcasts so candidate generation is a map-side join over the training-corpus scan; worst-case understatement is bands × threshold",
    },
    "index_eviction_near_dup_documents": {
        "broadcast_above_generate": "same O(delta) contract as incremental_near_dup_documents (the query IS incremental_near_dup run against the evicted index): delta band rows (plan-constant ×bands fan-out) broadcast against the persisted index; the eviction itself is a broadcast LEFT ANTI of the tiny removal-id set — both broadcasts are the delta side by contract",
    },
    "index_expiry_near_dup_documents": {
        "broadcast_above_generate": "the TTL twin of index_eviction_near_dup_documents (r8, lsh_index.py::expire_index then incremental_near_dup): identical O(delta) contract — the expired-id set (one pruned corpus scan) broadcasts into the LEFT ANTI eviction, and the delta band rows broadcast against the expired index; both broadcast sides are delta-sized by the lifecycle's definition",
    },
    "nb_lang_classifier_documents": {
        "bnl_join": "label fan-out: tokens crossJoin the BROADCAST per-label stats frame, |labels| rows by construction (a small closed set — ml.py::nb_score's documented contract); the count-model join that follows is a plain shuffled equi-join on (tok, label)",
    },
    "rrf_fuse_documents": {
        "single_partition_window": "rank windows run AFTER TakeOrdered limit(20) — 20-row frames (top-k result lists), never the corpus; the fuse op itself is windowless by contract",
    },
    "binary_metrics_documents": {
        "single_partition_window": "AUC running-count window runs over the DISTINCT-SCORE table, bounded at 10^score_decimals rows (<=1M for [0,1] scores at 6dp) — sketch-sized by construction, same contract as the histogram-CDF quantile window",
    },
    "quantiles_totalprice_hist": {
        "bnl_join": "empty-bin completion joins the broadcast bin-range table (<= n_bins+2 rows) — sketch-sized side",
        "single_partition_window": "CDF window runs over the BIN table (<= n_bins+2 rows, sketch-sized), never the data",
    },
    "resample_events_hourly": {
        "bnl_join": "dense-grid materialization: groups x time-grid cross join IS the output; grid side = n_steps rows, known at plan time",
    },
    "gapfill_events_hourly": {
        "bnl_join": "same dense-grid shape as resample_events_hourly (grid side bounded by the requested window)",
    },
    "budget_allocate_sources": {
        "single_partition_window": "water-level prefix sums run over the DOMAIN table (one row per source — group-count-sized by the op's documented contract; raw rows never enter the window)",
    },
    "zipf_slope_documents": {
        "single_partition_window": "rank row_number runs AFTER orderBy().limit(top_k) — a TakeOrdered that bounds the frame to top_k (500) rows regardless of corpus size; raw tokens never enter the window (text.py::zipf_slope)",
    },
}


class _Node:
    __slots__ = ("cls", "raw", "children")

    def __init__(self, cls: str, raw: dict):
        self.cls = cls
        self.raw = raw
        self.children: list[_Node] = []


def _build_tree(nodes: list[dict]) -> _Node:
    """Reconstruct the plan tree from toJSON's pre-order node list."""
    it = iter(nodes)

    def rec() -> _Node:
        raw = next(it)
        n = _Node(raw.get("class", "?").rsplit(".", 1)[-1], raw)
        for _ in range(int(raw.get("num-children", 0))):
            n.children.append(rec())
        return n

    return rec()


def _is_scalar_side(n: _Node) -> bool:
    """True if this subtree produces (at most) one row: descend through
    single-child wrappers to an ungrouped aggregate."""
    while True:
        if n.cls in ("HashAggregateExec", "ObjectHashAggregateExec",
                     "SortAggregateExec"):
            return n.raw.get("groupingExpressions") in ([], None, "[]")
        if len(n.children) != 1:
            return False
        n = n.children[0]


def _walk(n: _Node):
    yield n
    for c in n.children:
        yield from _walk(c)


_BOUNDING = (
    "HashAggregateExec", "ObjectHashAggregateExec", "SortAggregateExec",
    "GlobalLimitExec", "LocalLimitExec", "TakeOrderedAndProjectExec",
)


def _direct_generate(n: _Node) -> bool:
    """True if a Generate is reachable from ``n`` without crossing a
    cardinality-bounding node (aggregate/limit) — the shape whose size
    estimate is structurally fan-out-understated."""
    if n.cls in _BOUNDING:
        return False
    if n.cls == "GenerateExec":
        return True
    return any(_direct_generate(c) for c in n.children)


def audit_plan(tree: _Node, plan_str: str) -> dict[str, bool]:
    bad_bnl = False
    cartesian = False
    single_win = False
    bcast_gen = False
    for n in _walk(tree):
        # the build side of any broadcast join (the exchange itself only
        # appears after plan preparation — sparkPlan() shows the join
        # node with its buildSide) must not contain a row-multiplying
        # Generate: its size estimate structurally predates the fan-out
        if n.cls in ("BroadcastHashJoinExec", "BroadcastNestedLoopJoinExec"):
            side = str(n.raw.get("buildSide", ""))
            build = None
            if "Left" in side and len(n.children) >= 1:
                build = n.children[0]
            elif "Right" in side and len(n.children) >= 2:
                build = n.children[1]
            if build is not None and _direct_generate(build):
                bcast_gen = True
        if n.cls == "BroadcastExchangeExec" and _direct_generate(
            n.children[0] if n.children else n
        ):
            bcast_gen = True
        if n.cls == "BroadcastNestedLoopJoinExec":
            # the engine-wide scalar-fold idiom (crossJoin of a 1-row
            # broadcast aggregate) is the CORRECT shape — only flag a
            # BNLJ where NEITHER side is a scalar aggregate
            if not any(_is_scalar_side(c) for c in n.children):
                bad_bnl = True
        if n.cls == "CartesianProductExec":
            cartesian = True
        if n.cls in ("WindowExec", "WindowGroupLimitExec") and n.raw.get(
            "partitionSpec"
        ) in ([], None):
            # empty partitionSpec ⇒ the whole input flows through ONE
            # task's window — the canonical scale-killer
            single_win = True
    return {
        "single_partition_window": single_win,
        "cartesian": cartesian,
        "bnl_join": bad_bnl,
        "broadcast_above_generate": bcast_gen,
        "python_row_udf": "BatchEvalPython" in plan_str,
        "global_limit_sort": (
            "GlobalLimit" in plan_str
            and "Sort" in plan_str
            and "TakeOrderedAndProject" not in plan_str
        ),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_AUDIT.json"

    from etl_tools_rs_spark.session import get_spark

    spark = get_spark("scale-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    return main_with(spark, sf_dir, out_path)


def main_with(spark, sf_dir: str, out_path: str) -> int:
    """Audit every registry query's physical plan on an existing session
    — callable from check_correctness so the gate refresh and the audit
    artifact can never diverge."""
    import __spark_entry__ as entrymod

    results: dict[str, dict] = {}
    bad = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            tree = _build_tree(json.loads(qe.sparkPlan().toJSON()))
            plan_str = qe.sparkPlan().toString()
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:200]}
            bad.append((name, f"explain failed: {e}"))
            continue
        flags = audit_plan(tree, plan_str)
        hits = {k: v for k, v in flags.items() if v}
        entry: dict = {"flags": sorted(k for k in hits if k not in ADVISORY)}
        adv = sorted(k for k in hits if k in ADVISORY)
        if adv:
            entry["advisories"] = adv
        for k in hits:
            if k in ADVISORY:
                continue
            reason = ALLOWLIST.get(name, {}).get(k)
            if reason:
                entry.setdefault("allowlisted", {})[k] = reason
            else:
                bad.append((name, k))
        results[name] = entry
    summary = {
        "n_queries": len(results),
        "n_flagged": sum(1 for r in results.values() if r.get("flags")),
        "n_advisories": sum(
            1 for r in results.values() if r.get("advisories")
        ),
        "violations": [f"{n}: {k}" for n, k in bad],
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(
        f"{summary['n_queries']} queries audited, "
        f"{summary['n_flagged']} with flags, "
        f"{summary['n_advisories']} with advisories, "
        f"{len(bad)} NON-allowlisted violations"
    )
    for n, r in sorted(results.items()):
        for k in r.get("advisories", []):
            print(f"ADVISORY   {n}: {k}")
    for n, k in bad:
        print(f"VIOLATION  {n}: {k}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
