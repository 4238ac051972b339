#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

For each <name> dir in outdir: read the Spark parquet result, run
oracle_sql.json[<name>] in DuckDB with views over the sf tables, compare
schema (column name sets), row counts, and exact values (columns sorted by
name, row order as produced). Prints a per-query PASS/FAIL table and the
first diff for failures.
"""
import json
import math
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(rel):
    return [tuple(canon(v) for v in row) for row in rel.fetchall()]


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        if name not in oracle:
            print(f"{name:22s} NO-ORACLE rows={len(spark_rel.fetchall())}")
            n_noracle += 1
            continue
        try:
            duck_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"{name:22s} FAIL oracle-sql-error: {e}")
            n_fail += 1
            continue
        scols = sorted(spark_rel.columns)
        dcols = sorted(duck_rel.columns)
        if scols != dcols:
            print(f"{name:22s} FAIL schema spark={scols} duck={dcols}")
            n_fail += 1
            continue
        sq = spark_rel.project(", ".join(f'"{c}"' for c in scols))
        dq = duck_rel.project(", ".join(f'"{c}"' for c in scols))
        srows, drows = rows_of(sq), rows_of(dq)
        if len(srows) != len(drows):
            print(f"{name:22s} FAIL rows spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        diff = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                diff = (i, a, b)
                break
        if diff:
            i, a, b = diff
            print(f"{name:22s} FAIL value row={i}")
            print(f"    cols : {scols}")
            print(f"    spark: {a}")
            print(f"    duck : {b}")
            n_fail += 1
        else:
            print(f"{name:22s} PASS rows={len(srows)}")
            n_pass += 1
    print(f"\n== {n_pass} pass / {n_fail} fail / {n_noracle} no-oracle ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
