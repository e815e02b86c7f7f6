#!/usr/bin/env python3
"""Regenerate BENCH_NOTES.md's per-SF table from three Bench artifacts.

Usage: python3 tools/bench_table.py <sf0.001.json> <sf0.01.json> <sf0.1.json>
Prints the markdown table (query | sf0.001 | sf0.01 | sf0.1 | ratio) plus
the totals line, sorted by query name — paste over the stale table.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v["median_sec"] if isinstance(v, dict) else v
            for k, v in d["queries"].items()}


def main():
    a, b, c = (load(p) for p in sys.argv[1:4])
    names = sorted(set(a) | set(b) | set(c))
    print(f"Totals: sf0.001 = {sum(a.values()):.1f} s, "
          f"sf0.01 = {sum(b.values()):.1f} s, sf0.1 = {sum(c.values()):.1f} s "
          f"({len(names)} queries)")
    print()
    print("| query | sf0.001 | sf0.01 | sf0.1 | 0.1/0.01 ratio |")
    print("|---|---|---|---|---|")
    for n in names:
        va, vb, vc = a.get(n), b.get(n), c.get(n)
        ratio = f"{vc / vb:.1f}x" if va is not None and vb and vc else "—"
        fmt = lambda v: f"{v:.2f}" if v is not None else "—"
        print(f"| {n} | {fmt(va)} | {fmt(vb)} | {fmt(vc)} | {ratio} |")


if __name__ == "__main__":
    main()
