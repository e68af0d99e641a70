"""Snapshot gate (r10, VERDICT r9 #2): the end-of-round snapshot must be
preceded by a full-registry sweep OF THAT TREE, with the sweep's
history-regression block empty or explicitly adjudicated.

The r9 mhonce regression shipped because the round's last commit was
never swept — the driver's runs were the first measurements of the
shipped tree. This gate makes that impossible to do silently:

    python tools/sweep_gate.py                # gate HEAD against history
    python tools/sweep_gate.py --adjudicated "reason ..."   # accept a
        non-empty regressions block with an on-the-record justification

Checks, in order:
1. the working tree is CLEAN (a dirty sweep proves nothing about a
   commit);
2. BENCH_HISTORY.json's most recent full-registry entry at the bench sf
   carries a ``tree.commit`` equal to HEAD and ``tree.dirty == false``
   (older entries lack the stamp — they never satisfy the gate);
3. that entry's recorded ``regressions`` block is empty, or
   ``--adjudicated`` was given (the reason is printed for the report).

Exit 0 = snapshot may proceed; exit 1 = sweep the current tree first.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def head_commit() -> str:
    return subprocess.run(
        ["git", "rev-parse", "HEAD"],
        cwd=_REPO_ROOT, capture_output=True, text=True, timeout=30,
    ).stdout.strip()


def tree_dirty() -> bool:
    return bool(
        subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=_REPO_ROOT, capture_output=True, text=True, timeout=30,
        ).stdout.strip()
    )


def registry_size() -> int:
    sys.path.insert(0, _REPO_ROOT)
    import bench  # noqa: WPS433 — the bench derives the sweep set

    return len(bench.bench_queries())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1,
                    help="bench scale factor the sweep must cover")
    ap.add_argument("--adjudicated", default=None,
                    help="accept a non-empty regressions block with this "
                         "on-the-record justification")
    ap.add_argument("--history", default=os.path.join(_REPO_ROOT, "BENCH_HISTORY.json"))
    args = ap.parse_args()

    if tree_dirty():
        print("sweep_gate: FAIL — working tree is dirty; commit (or stash) "
              "first, then sweep the committed tree", file=sys.stderr)
        return 1

    head = head_commit()
    try:
        with open(args.history) as f:
            runs = json.load(f).get("runs", [])
    except (OSError, ValueError) as e:
        print(f"sweep_gate: FAIL — cannot read history: {e}", file=sys.stderr)
        return 1

    n_required = registry_size()
    full = [
        r for r in runs
        if r.get("sf") == args.sf and len(r.get("queries", {})) >= n_required
    ]
    if not full:
        print(f"sweep_gate: FAIL — no full-registry ({n_required}-query) "
              f"sweep at sf={args.sf} in history", file=sys.stderr)
        return 1
    last = full[-1]
    tree = last.get("tree") or {}
    if tree.get("commit") != head:
        print(
            f"sweep_gate: FAIL — last full sweep ({last.get('ts')}) is for "
            f"tree {tree.get('commit') or '<unstamped>'}, HEAD is {head}. "
            f"Run the full bench on THIS tree before snapshotting.",
            file=sys.stderr,
        )
        return 1
    if tree.get("dirty"):
        print(f"sweep_gate: FAIL — last full sweep ({last.get('ts')}) ran on "
              f"a DIRTY checkout of {head}; re-sweep the committed tree",
              file=sys.stderr)
        return 1
    regs = last.get("regressions") or {}
    if regs and args.adjudicated is None:
        print(
            "sweep_gate: FAIL — the sweep's regression block is non-empty "
            f"and unadjudicated: {json.dumps(regs)}. Fix them or pass "
            "--adjudicated '<reason>' to accept on the record.",
            file=sys.stderr,
        )
        return 1
    verdict = "clean" if not regs else f"adjudicated: {args.adjudicated}"
    print(
        f"sweep_gate: OK — full {len(last['queries'])}-query sweep of "
        f"{head} at sf={args.sf} ({last.get('ts')}), regressions {verdict}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
