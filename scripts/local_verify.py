#!/usr/bin/env python3
"""Dev-only mimic of the driver's DuckDB-oracle compare.

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB with the testdata
tables registered by name, and compares: schema (sorted column names), row
count, and exact values (columns sorted by name, rows in produced order).
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        dt_mism = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in exp.columns
                   if got[c].dtype != exp[c].dtype]
        if dt_mism:
            print(f"FAIL {name}: dtype mismatches (spark, oracle): {dt_mism}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        mism = []
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            if ev != gv:
                bad = [(i, gv[i], ev[i]) for i in range(len(ev)) if gv[i] != ev[i]][:3]
                mism.append((c, bad))
        if mism:
            print(f"FAIL {name}: value mismatches: {mism}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(oracle) - failures}/{len(oracle)}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
