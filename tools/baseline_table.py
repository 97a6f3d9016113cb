#!/usr/bin/env python3
"""Regenerate the BASELINE.md per-query table from N bench-run JSON files.

Usage: python3 tools/baseline_table.py /tmp/bench_r8_run*.json

Prints: the header line (median total + per-run totals), the markdown
table (median/min/max seconds + median share of the run's own total,
sorted by median desc), and the sum-of-medians footer. Shares are
computed per run, then the median share is reported — the load-robust
metric BASELINE.md judges regressions on.
"""
import json
import statistics
import sys


def main(paths):
    if not paths:
        raise SystemExit("usage: baseline_table.py RUN1.json [RUN2.json ...]")
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f))
    names = sorted(runs[0]["queries"])
    for p, r in zip(paths, runs):
        if sorted(r["queries"]) != names:
            raise SystemExit(f"query sets differ across runs: {p}")
    totals = [r["value"] for r in runs]
    med_total = statistics.median(totals)
    print(f"totals: {' / '.join(f'{t:.1f}' for t in sorted(totals))}  "
          f"median {med_total:.1f}")
    rows = []
    for q in names:
        secs = [r["queries"][q] for r in runs]
        shares = [r["queries"][q] / r["value"] for r in runs]
        rows.append((statistics.median(secs), min(secs), max(secs),
                     statistics.median(shares), q))
    rows.sort(key=lambda x: (-x[0], x[4]))
    print("\n| query | median | min | max | share |")
    print("|---|---|---|---|---|")
    for med, lo, hi, share, q in rows:
        print(f"| {q} | {med:.2f} | {lo:.2f} | {hi:.2f} | {share*100:.1f}% |")
    print(f"\n(Sum of per-query medians: "
          f"{sum(r[0] for r in rows):.1f} s)")


if __name__ == "__main__":
    main(sys.argv[1:])
