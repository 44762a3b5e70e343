#!/usr/bin/env python3
"""Merge N full bench artifacts into a per-query MEDIAN baseline map.

Usage: tools/benchmedian.py OUT.json RUN1.json RUN2.json [RUN3.json ...]

Every run must be a lossless Bench artifact (target/bench.json /
SPARK_GRAFT_BENCH_ARCHIVE output). Queries/builds are medianed per key
over the runs that carry the key; the output is a valid bench artifact
(same shape BASELINE_BENCH.json has always had) plus a `median_of` list
of the source run totals so the provenance travels with the map — the
r12 re-baseline protocol, scripted.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        text = f.read().strip()
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("[info]"):
            line = line[len("[info]"):].strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                if "queries" in d:
                    return d
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no full bench JSON found in {path}")


def main():
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    if len(run_paths) < 2:
        raise SystemExit("need at least 2 runs to median")
    runs = [load(p) for p in run_paths]
    merged = {}
    for section in ("queries", "builds"):
        keys = sorted({k for r in runs for k in r.get(section, {})})
        merged[section] = {
            k: statistics.median([r[section][k] for r in runs
                                  if k in r.get(section, {})])
            for k in keys}
        only_some = [k for k in keys
                     if sum(k in r.get(section, {}) for r in runs) < len(runs)]
        if only_some:
            print(f"WARNING: {section} not in every run: {only_some}",
                  file=sys.stderr)
    qt = sum(merged["queries"].values())
    bt = sum(merged["builds"].values())
    artifact = {
        "metric": "total", "value": qt + bt, "unit": "sec",
        "query_total": qt, "build_total": bt,
        "st_repeat": runs[0].get("st_repeat"),
        "queries": merged["queries"], "builds": merged["builds"],
        "errors": sorted({e for r in runs for e in r.get("errors", [])}),
        "sf": runs[0].get("sf"),
        "median_of": [round(r.get("value", 0.0), 1) for r in runs],
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f)
        f.write("\n")
    print(f"wrote {out_path}: {len(merged['queries'])} queries "
          f"({qt:.1f} s) + {len(merged['builds'])} builds ({bt:.1f} s), "
          f"median of totals {artifact['median_of']}")


if __name__ == "__main__":
    main()
