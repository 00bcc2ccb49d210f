#!/usr/bin/env python3
"""Local differential harness mirroring the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB against the
sfDir parquet tables, and compares (schema-insensitively): columns
sorted by name, rows sorted by all columns, exact value equality
(floats compared to 1e-9 relative to flag near-misses separately).

The driver's hasher is TYPED: an int 3 vs float 3.0 hash-mismatches even
though Python says 3 == 3.0. So a cross-engine type mismatch (e.g. Spark
floor() -> BIGINT vs DuckDB floor() -> DOUBLE) is a hard FAIL here, not
a pass — it predicts a driver hash-red exactly.

This is a dev tool only — the driver has its own copy of this logic.
"""
import decimal
import glob
import json
import math
import sys

import duckdb


def kind(v):
    # Type "kind" mirroring the driver's hasher, which goes through a
    # pandas frame: DECIMAL and DOUBLE both land as float64 (so they
    # compare equal), but BIGINT lands as int64 (so int 3 != float 3.0).
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, (float, decimal.Decimal)):
        return "float"
    return type(v).__name__

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
            # Strict typed pass first: int != float even when values are
            # numerically equal — mirrors the driver's typed hasher.
            tm = next((j for j, (a, b) in enumerate(zip(rs, ro))
                       if a is not None and b is not None
                       and kind(a) != kind(b)), None)
            if tm is not None:
                bad = (i, rs, ro,
                       f"typed: col {sc[tm]} is {kind(rs[tm])} "
                       f"vs oracle {kind(ro[tm])}")
                break
            if rs != ro:
                exact = False
                if not all(eq(a, b) for a, b in zip(rs, ro)):
                    bad = (i, rs, ro, "value")
                    break
        if bad:
            i, rs, ro, why = bad
            print(f"FAIL {name}: row {i} differs ({why})\n  spark : {rs}\n  oracle: {ro}")
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
