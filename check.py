#!/usr/bin/env python3
"""Local dev replica of the driver's t2 correctness gate.

Usage: python3 check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over views named
after the testdata parquet tables, and compares THE WAY THE DRIVER DOES:
both sides go through pandas, columns sort by name, rows sort by value,
dtypes must be equal, values must hash-match exactly.

Two failure classes the old repr-based version of this script masked (and
the round-4 driver gate caught) are now hard errors BEFORE comparison:

  - HUGEINT/UHUGEINT oracle columns (DuckDB widens integer sum()s): pandas
    converts them to float64 while the Spark parquet side is int64 — the
    driver's hash can never match. Fix the oracle SQL: CAST(... AS BIGINT).
  - LIST/STRUCT-typed columns on either side: the driver's pandas row sort
    throws on unhashable numpy arrays. Fix the query: serialize the array
    (array_join / array_to_string) or explode to long form on BOTH engines.

Dev tool only — not part of the shipped library.
"""
import json, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD_TYPE_MARKERS = ("HUGEINT", "[]", "STRUCT", "MAP")


def type_preflight(name, side, rel):
    """Reject result types the driver's pandas comparator cannot handle."""
    bad = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
           if any(m in str(t).upper() for m in BAD_TYPE_MARKERS)]
    if bad:
        raise ValueError(
            f"{side} result has driver-incompatible column types: "
            f"{', '.join(bad)} (CAST sums to BIGINT / serialize arrays)")


def canon(df):
    """Driver-style canonicalization: columns by name, rows by value."""
    df = df[sorted(df.columns)]
    # sort_values on an object column holding numpy arrays raises — that is
    # intentional parity with the driver (type_preflight catches it first).
    if len(df.columns) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


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
            type_preflight(name, "spark", spark_rel)
            orel = con.sql(sql)
            type_preflight(name, "oracle", orel)
            sdf = canon(spark_rel.df())
            odf = canon(orel.df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            continue
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} "
                  f"oracle={list(odf.columns)}")
            continue
        if list(map(str, sdf.dtypes)) != list(map(str, odf.dtypes)):
            pairs = [f"{c}: {s} vs {o}" for c, s, o
                     in zip(sdf.columns, sdf.dtypes, odf.dtypes) if s != o]
            print(f"FAIL {name}: dtypes differ ({'; '.join(pairs)})")
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            continue
        sh = pd.util.hash_pandas_object(sdf, index=False)
        oh = pd.util.hash_pandas_object(odf, index=False)
        if not sh.equals(oh):
            bad = sdf[sh != oh]
            i = bad.index[0]
            print(f"FAIL {name}: {len(bad)}/{len(sdf)} rows hash-differ; "
                  f"first: spark={sdf.iloc[i].to_dict()} "
                  f"oracle={odf.iloc[i].to_dict()}")
            continue
        print(f"OK   {name}: {len(sdf)} rows")
        n_ok += 1
    print(f"== {n_ok}/{len(oracles)} queries match")
    sys.exit(0 if n_ok == len(oracles) else 1)


if __name__ == "__main__":
    main()
