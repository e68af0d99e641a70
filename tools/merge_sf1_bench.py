"""Merge the two-part r4 sf1 sweep (the chain run killed at the dense
ngram_jaccard_blocked query + the BENCH_ONLY resume of the remainder)
into one BENCH_r04_sf1.json, with the skipped queries documented.

Usage: python tools/merge_sf1_bench.py PARTIAL_JSON REST_JSON OUT_JSON
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    partial = json.load(open(sys.argv[1]))
    rest = json.load(open(sys.argv[2]))
    queries = dict(partial["queries"])
    overlap = set(queries) & set(rest["queries"])
    if overlap:
        raise SystemExit(f"overlapping measurements: {sorted(overlap)}")
    queries.update(rest["queries"])
    out = {
        "metric": "total_headline_query_seconds",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 1.0,
        "protocol": rest.get("protocol", "warm-median-of-2"),
        "skipped": {
            "dedup_token_jaccard": "answer is ~quadratic on the synthetic corpus (57% of pairs clear t=0.6) — output-bound for ANY exact algorithm",
            "ngram_jaccard_blocked": "t=0.2 on a near-dup-dense corpus: the within-block answer itself is dense; >20 min cold at sf1",
            "containment_pairs_blocked": "same dense-answer profile as ngram_jaccard_blocked",
        },
        "note": "merged from an interrupted full sweep (70 queries) + a BENCH_ONLY resume (remainder); identical snapshot, sf dir and protocol",
    }
    json.dump(out, open(sys.argv[3], "w"), indent=1, sort_keys=True)
    print(f"{len(queries)} queries, total {out['value']}s -> {sys.argv[3]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
