#!/usr/bin/env python3
"""Derive the README's headline counts from the artifacts of record
instead of hand-writing them (round-6 verdict, task #4: hand counts
drift).

Usage: python3 scripts/counts.py
Reads bench_full.json (always) and the newest CORRECTNESS_r*.json
(driver-written, if any), prints a summary block to paste or diff
against README.md's "Current numbers".
"""
import glob
import json
import os
import re

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    bench = json.load(open(os.path.join(HERE, "bench_full.json")))
    n_bench = len(bench.get("queries", {}))
    errors = bench.get("errors", [])
    print(f"bench_full.json: {n_bench} queries, total {bench['value']}"
          f" {bench.get('unit', 's')}, errors: {errors or 'none'}")

    corr = sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")),
                  key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if corr:
        latest = corr[-1]
        d = json.load(open(latest))
        rows = d if isinstance(d, dict) else {}
        def ok(v):
            if isinstance(v, dict):
                # driver row shape: rows_match/schema_match/hash_match
                # + err; a row is green only when all present checks
                # pass and no error was recorded
                checks = [v[k] for k in
                          ("rows_match", "schema_match", "hash_match")
                          if k in v]
                return bool(checks) and all(checks) and not v.get("err")
            return v in (True, "OK", "PASS", "pass")
        n_ok = sum(1 for v in rows.values() if ok(v))
        print(f"{os.path.basename(latest)}: {n_ok}/{len(rows)} green")
        bad = [k for k, v in rows.items() if not ok(v)]
        if bad:
            print("  red rows:", ", ".join(sorted(bad)))
    else:
        print("no CORRECTNESS_r*.json yet (driver writes it per round)")


if __name__ == "__main__":
    main()
