#!/usr/bin/env python3
"""Aggregate N cold Bench runs (+ optional reverse-order run) into the
BASELINE.md per-query median table.

Usage: baseline_agg.py run1.json run2.json ... [--reverse rev.json]
Prints: the markdown table (median/min/max per query, desc by median),
totals line, and reverse-order comparison stats.
"""
import json
import statistics
import sys


def main() -> None:
    args = sys.argv[1:]
    rev_path = None
    if "--reverse" in args:
        i = args.index("--reverse")
        rev_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    runs = [json.load(open(p)) for p in args]
    totals = [r["value"] for r in runs]
    queries = sorted(runs[0]["queries"].keys())
    for r in runs:
        assert sorted(r["queries"].keys()) == queries, "query sets differ"
        assert "errors" not in r, f"bench errors: {r.get('errors')}"

    stats = {}
    for q in queries:
        xs = [r["queries"][q] for r in runs]
        stats[q] = (statistics.median(xs), min(xs), max(xs))

    print(f"totals: {sorted(round(t, 1) for t in totals)}  "
          f"median {statistics.median(totals):.1f}  "
          f"min {min(totals):.1f}  max {max(totals):.1f}")
    med_sum = sum(m for m, _, _ in stats.values())
    print(f"sum of per-query medians: {med_sum:.1f}\n")

    if rev_path:
        rev = json.load(open(rev_path))
        assert sorted(rev["queries"].keys()) == queries
        worst = max(queries, key=lambda q: rev["queries"][q] / stats[q][2])
        ratio = rev["queries"][worst] / stats[worst][2]
        print(f"reverse-order total: {rev['value']:.1f}  "
              f"worst query vs normal-order max: {worst} "
              f"{rev['queries'][worst]:.2f}s = {ratio:.2f}x its max")
        over = [q for q in queries if rev["queries"][q] > 2 * stats[q][2]]
        print(f"queries >2x their normal-order max in reverse: {over or 'none'}\n")

    print("| query | median | min | max |")
    print("|---|---|---|---|")
    for q in sorted(queries, key=lambda q: -stats[q][0]):
        m, lo, hi = stats[q]
        print(f"| {q} | {m:.2f} | {lo:.2f} | {hi:.2f} |")


if __name__ == "__main__":
    main()
