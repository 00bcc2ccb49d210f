#!/usr/bin/env python3
"""Local differential harness mirroring the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB against the
sfDir parquet tables, and compares (schema-insensitively): columns
sorted by name, rows sorted by all columns, exact value equality
(floats compared to 1e-9 relative to flag near-misses separately).

This is a dev tool only — the driver has its own copy of this logic.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def sortkey(v):
    # Round floats before sorting so a tolerance-level Spark/DuckDB float
    # difference cannot reorder rows and misalign the zip compare.
    if isinstance(v, float):
        return f"f{v:.6e}"
    if isinstance(v, tuple):
        return "(" + ",".join(sortkey(x) for x in v) + ")"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(norm(row[i]) for i in order))
    return sorted(out, key=lambda t: tuple(sortkey(x) for x in t)), [cols[i] for i in order]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def eq(a, b):
    if type(a) is float and type(b) is float:
        return a == b or abs(a - b) <= 1e-9 * max(abs(a), abs(b))
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        rel = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        scols = [c[0] for c in rel.description]
        srows = rel.fetchall()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(srows)} rows)")
            n_noracle += 1
            continue
        try:
            orel = con.execute(oracle[name])
            ocols = [c[0] for c in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s, sc = canon(srows, scols)
        o, oc = canon(orows, ocols)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs oracle {oc}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: {len(s)} rows vs oracle {len(o)}")
            n_fail += 1
            continue
        bad = None
        exact = True
        for i, (rs, ro) in enumerate(zip(s, o)):
            if rs != ro:
                exact = False
                if not all(eq(a, b) for a, b in zip(rs, ro)):
                    bad = (i, rs, ro)
                    break
        if bad:
            i, rs, ro = bad
            print(f"FAIL {name}: row {i} differs\n  spark : {rs}\n  oracle: {ro}")
            n_fail += 1
        elif not exact:
            print(f"WARN {name}: matches only within float tolerance (driver may hash-mismatch)")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
