#!/usr/bin/env python3
"""Compare two full-surface Bench runs (the r9 verdict's #8 done criterion:
back-to-back runs whose per-key warm ratios stay within 1.5x for 95% of
keys — the structural proof that the between-key scrub + outlier re-time
made the single-JVM bench trustworthy).

Usage: python3 scripts/bench_variance.py BENCH_A.json BENCH_B.json [--table]

Prints the ratio distribution (max/A vs min/A per key), the share of keys
within 1.5x, and the offenders beyond it.
"""
import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    keys = sorted(set(qa) & set(qb))
    ratios = []
    for k in keys:
        x, y = qa[k], qb[k]
        if x <= 0 or y <= 0:
            print(f"SKIP {k}: non-positive time a={x} b={y}")
            continue
        ratios.append((max(x, y) / min(x, y), k, x, y))
    ratios.sort(reverse=True)
    n = len(ratios)
    within = sum(1 for r, *_ in ratios if r <= 1.5)
    pct = 100.0 * within / n if n else 0.0
    print(f"keys compared: {n}")
    if n == 0:
        print("no overlapping keys with positive times — nothing to compare")
        return
    print(f"within 1.5x:   {within} ({pct:.1f}%)  "
          f"[criterion: >= 95% -> {'PASS' if pct >= 95.0 else 'FAIL'}]")
    qs = sorted(r for r, *_ in ratios)
    for p in (50, 90, 95, 99):
        print(f"p{p}: {qs[min(n - 1, int(n * p / 100))]:.3f}x")
    print("worst 10:")
    for r, k, x, y in ratios[:10]:
        print(f"  {r:6.2f}x  {k:34s} a={x:7.2f}s b={y:7.2f}s")
    if "--table" in sys.argv:
        for r, k, x, y in sorted(ratios, key=lambda t: t[1]):
            print(f"{k:36s} {x:8.2f} {y:8.2f} {r:6.2f}")


if __name__ == "__main__":
    main()
