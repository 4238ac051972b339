#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

For each <name> dir in outdir: read the Spark parquet result, run
oracle_sql.json[<name>] in DuckDB with views over the sf tables, compare
schema (column name sets), per-column Arrow dtypes, row counts, and
canonical cell values (columns sorted by name, row order as produced).
Prints a per-query PASS/FAIL table and the first diff for failures.

Cells are compared as (arrow dtype, repr(value)) — NOT Python equality —
because the driver hashes a canonical serialization. Python `==` treats
-0.0 == 0.0 and Decimal(HUGEINT) == int(BIGINT), which is exactly how
three round-8 queries shipped locally green but failed the driver's hash
gate. repr() distinguishes both (repr(-0.0) = '-0.0'; a Decimal reprs as
Decimal('…')), so local green implies driver green.
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
        return repr(v)  # shortest-roundtrip; keeps the -0.0 sign
    return repr(v)  # Decimal('5') != 5, so HUGEINT leaks are visible


def cells_of(rel):
    """(sorted cols, {col: dtype}, rows as tuples of canonical reprs)."""
    tbl = rel.arrow()
    cols = sorted(tbl.column_names)
    types = {c: str(tbl.schema.field(c).type) for c in cols}
    col_vals = [tbl.column(c).to_pylist() for c in cols]
    rows = [tuple(canon(col[i]) for col in col_vals)
            for i in range(tbl.num_rows)]
    return cols, types, rows


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
        scols, stypes, srows = cells_of(spark_rel)
        dcols, dtypes, drows = cells_of(duck_rel)
        if scols != dcols:
            print(f"{name:22s} FAIL schema spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if stypes != dtypes:
            bad = {c: (stypes[c], dtypes[c]) for c in scols
                   if stypes[c] != dtypes[c]}
            print(f"{name:22s} FAIL dtype (spark, duck) per col: {bad}")
            n_fail += 1
            continue
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
