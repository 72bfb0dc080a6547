#!/usr/bin/env python3
"""Local replica of the driver's correctness compare (builder tooling only —
NOT part of the library). Runs each oracle SQL in DuckDB over the same
parquet tables and compares with the Spark result dumped by graft.Verify.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Sort columns by name, then rows by all columns; return list of rows."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = df.values.tolist()
    rows.sort(key=lambda r: [(x is None, str(x)) for x in r])
    return cols, rows


def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            # Verify writes <name>.err when the query THREW — surface the
            # crash message instead of a bare "no output" (an absent row
            # is a crash, round-8 lesson)
            try:
                msg = open(f"{outdir}/{name}.err").read().strip()
                print(f"FAIL {name}: query crashed: {msg}")
            except OSError:
                print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        ec, er = canon(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} differs\n  spark={bad[1]}\n  duck ={bad[2]}")
            # show dtypes to help diagnose
            print(f"  spark dtypes: {dict(got.dtypes.astype(str))}")
            print(f"  duck  dtypes: {dict(exp.dtypes.astype(str))}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
