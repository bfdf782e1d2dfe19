#!/usr/bin/env python3
"""Diff two Bench JSON outputs (bench_out.json / BENCH_r{N}.json files or
raw {"queries": {...}} lines): per-query deltas sorted by regression,
totals, and queries present in only one side. Dev tool only.

Usage: python3 tools/compare_bench.py <old.json> <new.json> [top_n]
"""
import json
import re
import sys


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = {}
    if "queries" in d:
        return {k: float(v) for k, v in d["queries"].items() if float(v) >= 0}
    # driver BENCH_r{N}.json wraps (and sometimes truncates) the line in
    # a "tail" field — recover what parses
    hay = d.get("tail", raw) if isinstance(d, dict) else raw
    pairs = re.findall(r'"(q[0-9][0-9a-z_]+)":([0-9.]+)', hay)
    return {k: float(v) for k, v in pairs}


def main(old_path, new_path, top_n=10):
    old, new = load(old_path), load(new_path)
    shared = sorted(set(old) & set(new))
    rows = sorted(((new[k] - old[k], k) for k in shared), reverse=True)
    print(f"shared queries: {len(shared)}  "
          f"sum {sum(old[k] for k in shared):.1f}s -> {sum(new[k] for k in shared):.1f}s")
    # filter by delta sign so a small shared set never re-prints the same
    # entries under both headings (or mislabels all-positive deltas)
    regressions = [(d, k) for d, k in rows if d > 0]
    improvements = [(d, k) for d, k in rows if d < 0]
    print(f"\ntop {min(top_n, len(regressions))} regressions:")
    for d, k in regressions[:top_n]:
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({d:+.2f})")
    print(f"\ntop {min(top_n, len(improvements))} improvements:")
    for d, k in improvements[-top_n:][::-1]:
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({d:+.2f})")
    only_old, only_new = sorted(set(old) - set(new)), sorted(set(new) - set(old))
    if only_old:
        print(f"\nonly in {old_path}: {only_old}")
    if only_new:
        print(f"\nonly in {new_path}: "
              + ", ".join(f"{k} ({new[k]:.2f}s)" for k in only_new))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
