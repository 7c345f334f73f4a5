#!/usr/bin/env python3
"""Bench regression tripwire: diff two solo-bench JSON artifacts.

Usage: python3 bench_diff.py <previous.json> <current.json>
       [--ratio 1.5] [--floor 0.3]

Flags every query whose time moved by more than --ratio in EITHER
direction AND by more than --floor seconds absolute (sub-floor jitter on
fast queries is noise at local[32]); prints added/removed queries and the
total. Exit code 1 if any slowdown is flagged (speedups are reported but
never fail), so the round workflow can gate on it mechanically — this is
the adjudication the round-6 verdict did by hand.

Dev/round tool only — not part of the shipped library.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' map — not a solo-bench artifact")
    return d


def check_modes(prev, cur, ppath, cpath):
    """A count()-mode artifact under-prices projection-heavy queries
    (column pruning); diffing it against a full-materialization artifact
    is meaningless. Artifacts without the field predate round 9 and are
    count()-mode by construction."""
    pm = prev.get("materialize", "count")
    cm = cur.get("materialize", "count")
    if pm != cm:
        sys.exit(f"REFUSING mixed-mode diff: {ppath} is '{pm}'-mode, "
                 f"{cpath} is '{cm}'-mode — re-run one side "
                 "(SPARK_GRAFT_MATERIALIZE) so both artifacts price the "
                 "same thing")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("previous")
    ap.add_argument("current")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.3)
    args = ap.parse_args()

    prev, cur = load(args.previous), load(args.current)
    check_modes(prev, cur, args.previous, args.current)
    pq, cq = prev["queries"], cur["queries"]
    shared = sorted(set(pq) & set(cq))
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))

    # Machine-drift normalization (round-12 item 5): x00_calibration is
    # a fixed synthetic workload benched into every artifact — identical
    # work both sides, so its ratio measures THIS pair of runs' machine
    # condition, not the code. Round-13 finding: the probe's condition
    # factor can DIVERGE from the suite's (r12->r13 the CPU-bound probe
    # ran 0.68x while the parquet-heavy suite ran 1.06x, so dividing by
    # it manufactured 126 false flags). A real regression inflates the
    # RAW ratio and survives ANY honest normalization; drift inflates
    # one view or the other. So when both artifacts carry the probe, a
    # query is flagged only when BOTH its raw and calibrated ratios
    # exceed the threshold (the conservative intersection), and both
    # numbers print for the adjudication record. The probe itself is
    # exempt. Artifacts without it (pre-r12) diff exactly as before.
    CAL = "x00_calibration"
    cal = None
    if CAL in pq and CAL in cq and pq[CAL] > 0 and cq[CAL] > 0:
        cal = cq[CAL] / pq[CAL]
        print(f"calibration: {pq[CAL]:.2f}s -> {cq[CAL]:.2f}s "
              f"({cal:.2f}x machine drift; flags need raw AND "
              "calibrated agreement)")

    slowdowns, speedups = [], []
    for name in shared:
        if name == CAL:
            continue
        p, c = pq[name], cq[name]
        c_adj = c / cal if cal else c
        # the floor and threshold apply to the raw numbers; calibration
        # can only VETO a flag, never create one
        if abs(c - p) < args.floor:
            continue
        if c > p * args.ratio and c_adj > p * args.ratio:
            slowdowns.append((name, p, c))
        elif p > c * args.ratio and p > c_adj * args.ratio:
            speedups.append((name, p, c))

    # totals exclude the calibration probe (fixed synthetic work) and,
    # when it is present, print the machine-normalized ratio beside the
    # raw one — otherwise the headline reads pure drift
    tot_q = [n for n in shared if n != CAL]
    pt = sum(pq[n] for n in tot_q)
    ct = sum(cq[n] for n in tot_q)
    if pt > 0:
        line = (f"shared queries: {len(tot_q)}  "
                f"prev {pt:.1f}s -> cur {ct:.1f}s ({ct / pt:.2f}x raw")
        line += f", {ct / cal / pt:.2f}x calibrated)" if cal else ")"
        print(line)
    else:
        print(f"shared queries: {len(tot_q)}")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    def cal_note(p, c):
        return f", {c / cal / p:.2f}x cal" if cal else ""
    for name, p, c in sorted(speedups, key=lambda x: x[1] - x[2]):
        print(f"FASTER  {name}: {p:.2f}s -> {c:.2f}s "
              f"({c / p:.2f}x raw{cal_note(p, c)})")
    for name, p, c in sorted(slowdowns, key=lambda x: x[1] - x[2]):
        print(f"SLOWER  {name}: {p:.2f}s -> {c:.2f}s "
              f"({c / p:.2f}x raw{cal_note(p, c)})")
    errs = {n: e for n, e in cur.get("errors", {}).items()}
    if errs:
        print(f"current-run errors ({len(errs)}): {', '.join(sorted(errs))}")
    if slowdowns or errs:
        print(f"TRIPWIRE FAILED: {len(slowdowns)} slowdowns, "
              f"{len(errs)} errors")
        sys.exit(1)
    print("TRIPWIRE PASSED: no per-query slowdown beyond "
          f"{args.ratio}x (+{args.floor}s floor)")


if __name__ == "__main__":
    main()
