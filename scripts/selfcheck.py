#!/usr/bin/env python3
"""Local stand-in for the driver's Verify->DuckDB correctness gate.

Usage: scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over the parquet tables in <sfDir>, and compares
against the Spark result parquet the same way the driver does: columns
sorted by name, rows canonicalized and sorted, values compared exactly.
Queries without an oracle entry are reported rows-only. Exit 0 iff every
oracle-eligible query matches.

Dev tooling only (duckdb/pandas are driver-side deps, not library deps).
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Canonical row multiset: columns sorted by name, every cell
    stringified (floats via repr of float64 — both engines hand back
    IEEE doubles, and catalog queries round any float output, so exact
    repr compare is the driver-faithful check).

    INVARIANT this relies on: every catalog query ROUNDS its float
    outputs (round(x, n)) so both engines serialize the identical
    double. A new catalog entry emitting raw unrounded doubles can
    hash-mismatch on last-bit noise even when semantically equal —
    when that happens the report entry carries
    ``floats_within_eps: true`` (see rows_close) to distinguish float
    formatting drift from a real divergence."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            # NaN != NaN; normalize so a NaN matches a NaN
            return "NaN" if v != v else repr(v)
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return str(v)

    rows = sorted(tuple(cell(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows


def rows_close(s_rows, o_rows, rel=1e-9):
    """Diagnostic only (the gate stays exact, like the driver's): true
    iff every cell matches exactly OR both parse as floats within
    relative epsilon — flags mismatches that are float-formatting
    noise rather than real divergence."""
    if len(s_rows) != len(o_rows):
        return False
    for a, b in zip(s_rows, o_rows):
        if len(a) != len(b):
            return False
        for x, y in zip(a, b):
            if x == y:
                continue
            try:
                fx, fy = float(x), float(y)
            except ValueError:
                return False
            if not abs(fx - fy) <= rel * max(abs(fx), abs(fy)):
                return False
    return True


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    report, failed, warned = {}, [], []
    for name in names:
        glob_path = os.path.join(out_dir, name, "*.parquet")
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{glob_path}')").fetchdf()
        except Exception as e:  # noqa: BLE001 - report, don't crash the gate
            report[name] = {"err": f"spark result unreadable: {e}"}
            failed.append(name)
            continue
        if name not in oracle:
            # An empty rows-only result is suspicious but not provably
            # wrong (a filter can legitimately match nothing at a small
            # SF); warn loudly instead of failing — only the driver's
            # oracle compare can prove a divergence, and a false RED
            # here would mask real failures.
            entry = {"rows_only": True, "spark_rows": len(sdf), "ok": True}
            if len(sdf) == 0:
                entry["warn"] = "empty result"
                warned.append(name)
            report[name] = entry
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            report[name] = {"err": f"oracle sql failed: {e}"}
            failed.append(name)
            continue
        s_cols, s_rows = canon(sdf)
        o_cols, o_rows = canon(odf)
        entry = {"rows_match": len(s_rows) == len(o_rows),
                 "schema_match": s_cols == o_cols,
                 "hash_match": s_rows == o_rows,
                 "spark_rows": len(s_rows), "oracle_rows": len(o_rows)}
        report[name] = entry
        if not (entry["rows_match"] and entry["schema_match"]
                and entry["hash_match"]):
            failed.append(name)
            # distinguish float-formatting noise from a real divergence
            entry["floats_within_eps"] = rows_close(s_rows, o_rows)
            # show the first diverging row to make the diff actionable
            diff = next((i for i, (a, b) in enumerate(zip(s_rows, o_rows))
                         if a != b), None)
            if diff is not None:
                entry["first_diff"] = {"row": diff, "spark": s_rows[diff],
                                       "oracle": o_rows[diff]}

    out_path = os.path.join(out_dir, "selfcheck.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True, default=str)
    n_oracle = sum(1 for r in report.values() if "rows_match" in r)
    n_green = sum(1 for r in report.values()
                  if r.get("rows_match") and r.get("schema_match")
                  and r.get("hash_match"))
    print(f"selfcheck: {n_green}/{n_oracle} oracle-eligible green, "
          f"{len(report) - n_oracle} rows-only, report at {out_path}")
    if warned:
        print("WARN (rows-only, empty result): " + ", ".join(sorted(warned)))
    if failed:
        print("FAILED: " + ", ".join(sorted(failed)))
        sys.exit(1)


if __name__ == "__main__":
    main()
