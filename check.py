#!/usr/bin/env python3
"""Local dev replica of the driver's t2 correctness gate.

Usage: python3 check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over views named
after the testdata parquet tables, sorts columns by name and rows by value,
and compares cell-by-cell. Dev tool only — not part of the shipped library.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols, srows = canon(spark_rel.fetchall(), spark_rel.columns)
            orel = con.sql(sql)
            ocols, orows = canon(orel.fetchall(), orel.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            continue
        print(f"OK   {name}: {len(srows)} rows")
        n_ok += 1
    print(f"== {n_ok}/{len(oracles)} queries match")
    sys.exit(0 if n_ok == len(oracles) else 1)

if __name__ == "__main__":
    main()
