#!/usr/bin/env python3
"""Per-query scale-ratio table between two BENCH_FULL.json dumps.

Usage: python3 tools/ratio.py <bench_small.json> <bench_big.json> [flag_ratio]

Prints a markdown table sorted by ratio (descending) and flags every
query whose wall-time ratio exceeds flag_ratio (default 15 — the
r18-verdict threshold for "superlinear at 10x data"). Sub-second small-SF
times are floored at 0.2 s before the ratio so noise on near-zero
denominators cannot fake a superlinear.
"""
import json
import sys

def load(p):
    with open(p) as f:
        d = json.load(f)
    return d

def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    qs, qb = small["queries"], big["queries"]
    sent_s = small.get("sentinel") or 1.0
    sent_b = big.get("sentinel") or 1.0
    rows = []
    for name in sorted(set(qs) & set(qb)):
        s, b = qs[name], qb[name]
        if s is None or b is None:
            continue
        ratio = b / max(s, 0.2)
        # sentinel-normalized ratio corrects host co-tenancy between runs
        nratio = (b / sent_b) / (max(s, 0.2) / sent_s)
        rows.append((name, s, b, ratio, nratio))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if min(r[3], r[4]) > flag]
    print(f"| query | t_small (s) | t_big (s) | ratio | sentinel-norm |")
    print(f"|---|---|---|---|---|")
    for name, s, b, ratio, nratio in rows:
        mark = " **FLAG**" if min(ratio, nratio) > flag else ""
        print(f"| {name}{mark} | {s:.2f} | {b:.2f} | {ratio:.1f}x | {nratio:.1f}x |")
    print()
    print(f"queries: {len(rows)}  flagged(>{flag}x): {len(flagged)}")
    print(f"totals: {small.get('value')} -> {big.get('value')} s; "
          f"sentinels: {sent_s} / {sent_b}")
    missing = sorted(set(qs) ^ set(qb))
    if missing:
        print(f"missing from one side: {missing}")

if __name__ == "__main__":
    main()
