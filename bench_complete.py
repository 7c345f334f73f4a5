#!/usr/bin/env python3
"""Closing-bench completeness gate (round-7 verdict item 3).

Asserts that a solo-bench artifact covers EVERY registered query, so a
bench regenerated before the round's last query lands cannot silently
ship incomplete (the round-7 q350 gap).

Usage:
    sbt -batch "runMain graft.ListQueries" | grep -o "QUERY q[a-z0-9_]*" > /tmp/queries.txt
    python3 bench_complete.py SOLO_BENCH_r9.json [SOLO_BENCH_r9_count.json ...] /tmp/queries.txt

Accepts MULTIPLE bench artifacts (round-8 verdict: the secondary
full-materialization artifact shipped stale, missing the last two
queries) — every artifact listed must independently cover every
registered key. Exit 0 iff each artifact's keys ⊇ registered keys (extra
bench-only entries, e.g. production-hash x-variants, are reported but
allowed).
"""
import json
import sys


def check_one(bench_path: str, keys_path: str) -> int:
    with open(bench_path) as f:
        bench = json.load(f)
    bench_keys = set(bench.get("queries", {}))
    registered = set()
    with open(keys_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("QUERY "):  # tolerates sbt [info] prefixes via grep -o
                registered.add(line.split(" ", 1)[1])
            elif line and not line.startswith("["):
                registered.add(line)
    if not registered:
        print("ERROR: no registered query keys parsed from", keys_path)
        return 2
    missing = sorted(registered - bench_keys)
    extra = sorted(bench_keys - registered)
    mode = bench.get("materialize", "count")
    print(f"{bench_path} (mode={mode}): registered={len(registered)} "
          f"bench={len(bench_keys)} missing={len(missing)} "
          f"bench_only={len(extra)}")
    if extra:
        print("bench-only entries (allowed):", ", ".join(extra))
    if missing:
        print("MISSING from bench artifact:", ", ".join(missing))
        print("FAIL: regenerate the solo bench after the last query lands")
        return 1
    print(f"COMPLETE: {bench_path} covers every registered query")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    keys = sys.argv[-1]
    sys.exit(max(check_one(b, keys) for b in sys.argv[1:-1]))
