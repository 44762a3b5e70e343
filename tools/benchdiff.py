#!/usr/bin/env python3
"""Per-query diff of two FULL bench artifacts (BENCH_FULL_r{N}.json or
target/bench.json — the lossless format Bench writes; NOT the driver's
truncated BENCH_r{N}.json tail).

Usage: tools/benchdiff.py OLD.json NEW.json [--threshold-pct 20]

Prints every query/build present in both files with its delta, flags
moves outside the threshold, and lists entries only in one file — the
exact adjudication the r10 judge had to do by regex-scraping truncated
tails. Exit code 1 when any overlapping entry moved more than the
threshold (so CI-style use is possible), 0 otherwise.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read().strip()
    # tolerate sbt "[info] " prefixes if someone saved raw stdout
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("[info]"):
            line = line[len("[info]"):].strip()
        if line.startswith("{"):
            # a malformed '{'-prefixed line (truncated tail) must not end
            # the scan — later lines may carry the full map
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if "queries" in d:
                return d
    raise SystemExit(f"{path}: no bench JSON line with a 'queries' map found")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold-pct", type=float, default=20.0,
                    help="flag overlap moves beyond this %% (default 20)")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    flagged = []
    for kind in ("queries", "builds"):
        o, n = old.get(kind, {}), new.get(kind, {})
        both = sorted(set(o) & set(n))
        only_old = sorted(set(o) - set(n))
        only_new = sorted(set(n) - set(o))
        print(f"== {kind}: {len(both)} overlapping, "
              f"{len(only_new)} new, {len(only_old)} removed ==")
        osum = sum(o[k] for k in both)
        nsum = sum(n[k] for k in both)
        for k in sorted(both, key=lambda k: -(n[k] - o[k])):
            d = n[k] - o[k]
            # a 0.0s baseline has no meaningful pct: report the absolute
            # move only and flag solely on the >0.5s absolute test
            pct = (d / o[k] * 100) if o[k] > 0 else None
            mark = ""
            if (pct is None or abs(pct) > args.threshold_pct) and abs(d) > 0.5:
                mark = "  <-- outside band"
                flagged.append((kind, k, o[k], n[k], pct))
            pct_s = f"{pct:+6.1f}%" if pct is not None else "  n/a "
            print(f"  {k:45s} {o[k]:8.2f} -> {n[k]:8.2f}  "
                  f"({d:+7.2f} s, {pct_s}){mark}")
        print(f"  {'OVERLAP TOTAL':45s} {osum:8.2f} -> {nsum:8.2f}  "
              f"({nsum - osum:+7.2f} s)")
        for k in only_new:
            print(f"  NEW      {k:40s} {n[k]:8.2f}")
        for k in only_old:
            print(f"  REMOVED  {k:40s} {o[k]:8.2f}")
        print()

    if flagged:
        print(f"{len(flagged)} entr{'y' if len(flagged) == 1 else 'ies'} "
              f"moved >{args.threshold_pct:.0f}% and >0.5 s — adjudicate "
              "with isolated runs (the r8-st10 / r11-st12 protocol) before "
              "calling regression or noise:")
        for kind, k, ov, nv, pct in flagged:
            pct_s = f"{pct:+.1f}%" if pct is not None else "n/a (0s baseline)"
            print(f"  {kind}/{k}: {ov:.2f} -> {nv:.2f} ({pct_s})")
        sys.exit(1)


if __name__ == "__main__":
    main()
