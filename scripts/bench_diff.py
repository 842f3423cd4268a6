#!/usr/bin/env python3
"""Diff two bench artifacts (bench_full.json or a driver BENCH_r*.json
whose stdout tail still contains the JSON line). Prints per-query
deltas sorted by regression ratio, worst first.

Usage: bench_diff.py OLD NEW [threshold_ratio]
"""
import json
import re
import sys


def load(path):
    data = json.load(open(path))
    if "queries" in data:                      # bench_full.json
        return data["queries"]
    if isinstance(data.get("parsed"), dict):   # driver artifact, intact
        return data["parsed"]["queries"]
    if "tail" in data:                         # driver artifact, truncated
        out = {}
        for k, v in re.findall(r'"([a-z][a-z0-9_]{3,})":(-?\d+\.\d+)',
                               data["tail"]):
            out[k] = float(v)
        out.pop("value", None)
        return out
    raise SystemExit(f"no bench JSON found in {path}")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    common = sorted(set(old) & set(new))
    gone = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    rows = [(new[q] / old[q] if old[q] > 0 else float("inf"), q) for q in common]
    rows.sort(reverse=True)
    print(f"| query | {sys.argv[1]} | {sys.argv[2]} | ratio |")
    print("|---|---|---|---|")
    flagged = 0
    for r, q in rows:
        if r >= thresh or r <= 1 / thresh:
            print(f"| {q} | {old[q]:.3f} | {new[q]:.3f} | {r:.2f}x |")
            flagged += 1
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"\ncommon: {len(common)} queries, {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old:.2f}x); {flagged} outside [{1/thresh:.2f}, {thresh}]")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if gone:
        print(f"removed ({len(gone)}): {', '.join(gone)}")


if __name__ == "__main__":
    main()
