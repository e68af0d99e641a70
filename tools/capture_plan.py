"""Capture ``explain('formatted')`` for registry queries into plan files.

Usage:

    python tools/capture_plan.py <out_dir> <suffix> <query> [query ...]

For each query this BUILDS the declared DataFrame (any eager driver-side
work — e.g. exact-quantized PQ training — runs under a labeled job
group so the build's Spark job count is recorded in the header; that
count is the measurable plan-shape evidence for fusions whose win is in
eager jobs rather than the returned DataFrame's tree) and writes
``<out_dir>/<query>_<suffix>.txt``.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def _containing_tree(path: str) -> str | None:
    """The git working-tree root containing ``path`` (walk up for a
    ``.git`` entry), or None if path is outside any checkout."""
    d = os.path.realpath(path)
    while True:
        if os.path.exists(os.path.join(d, ".git")):
            return d
        parent = os.path.dirname(d)
        if parent == d:
            return None
        d = parent


def assert_out_dir_matches_tree(out_dir: str, repo_root: str = _REPO_ROOT) -> None:
    """Provenance gate (r10, VERDICT r9 #3/#7): a plan dump's ``# tree:``
    header records the checkout whose code BUILT the plan (this tool's
    own location). Writing such a dump into another checkout's ``plans/``
    dir is how r9 shipped an "after" file captured from the PRE tree —
    refuse the write unless the trees match (override:
    ``SPARK_GRAFT_ALLOW_FOREIGN_PLAN_DIR=1``, for deliberate
    cross-tree archiving)."""
    if os.environ.get("SPARK_GRAFT_ALLOW_FOREIGN_PLAN_DIR"):
        return
    dest_tree = _containing_tree(out_dir)
    if dest_tree is not None and dest_tree != os.path.realpath(repo_root):
        raise SystemExit(
            f"capture_plan: out_dir {out_dir!r} lives in checkout "
            f"{dest_tree!r} but the plans would be captured from "
            f"{repo_root!r} — the dump's '# tree:' header would not match "
            f"the tree it claims to document (the r9 mhonce mislabel). "
            f"Run the tool from the destination tree, or set "
            f"SPARK_GRAFT_ALLOW_FOREIGN_PLAN_DIR=1 to archive "
            f"cross-tree deliberately."
        )


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    assert_out_dir_matches_tree(out_dir)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from etl_tools_rs_spark.session import get_spark

    spark = get_spark("capture-plan")
    qs = entrymod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        sc = spark.sparkContext
        group = f"build:{name}"
        sc.setJobGroup(group, f"eager build work for {name}")
        spark.catalog.clearCache()
        df = qs[name](spark, sf_dir)
        build_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup(f"post:{name}", "")
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — explain('formatted') of the declared query's "
                f"returned DataFrame\n# tree: {_REPO_ROOT}  sf_dir: {sf_dir}\n"
                f"# eager Spark jobs during queries()[name](...) build: "
                f"{build_jobs}\n\n"
            )
            fh.write(plan)
        print(f"wrote {path} (build jobs: {build_jobs})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
