"""Compare two bench JSON outputs across scale factors and flag
super-linear growth (VERDICT r3 task #1).

A query that is ~linear in data size should grow by ≤ the data ratio
(10× for sf0.1 → sf1), modulo fixed overheads that make small-SF times
look worse (so growth FAR BELOW the ratio is expected for sub-second
queries — per-query job setup dominates them at sf0.1). The flag
threshold is growth > ratio × slack; anything flagged needs a written
explanation or a fix in SCALE.md.

Usage: python tools/scale_compare.py BENCH_small.json BENCH_big.json [ratio] [slack]
Prints a markdown table sorted by growth, then the flagged list.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    small_path, big_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    slack = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    sq, bq = small["queries"], big["queries"]
    shared = sorted(set(sq) & set(bq))
    rows = []
    for name in shared:
        a, b = sq[name], bq[name]
        growth = b / a if a > 0 else float("inf")
        rows.append((growth, name, a, b))
    rows.sort(reverse=True)
    print(f"| query | {small.get('sf')}s | {big.get('sf')}s | growth |")
    print("|---|---|---|---|")
    for growth, name, a, b in rows:
        print(f"| {name} | {a:.2f} | {b:.2f} | {growth:.1f}x |")
    flagged = [
        (g, n, a, b) for g, n, a, b in rows if g > ratio * slack and b - a > 1.0
    ]
    print()
    print(
        f"# shared={len(shared)} flagged(growth>{ratio * slack:.0f}x and "
        f"+1s)={len(flagged)}"
    )
    for g, n, a, b in flagged:
        print(f"# FLAG {n}: {a:.2f}s -> {b:.2f}s ({g:.1f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
