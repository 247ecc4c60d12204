#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run each oracle SQL in DuckDB over the sf parquet tables and compare with
the Spark result parquet written by graft.Verify.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # sort columns by name, then rows by all columns (stringified)
    df = df[sorted(df.columns)]
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq = os.path.join(out_dir, name)
        files = glob.glob(pq + "/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = norm(con.sql(f"SELECT * FROM '{pq}/*.parquet'").df())
            ora_df = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(spark_df.columns) != list(ora_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} oracle={list(ora_df.columns)}")
            n_fail += 1; continue
        sdt = [str(t) for t in spark_df.dtypes]
        odt = [str(t) for t in ora_df.dtypes]
        if sdt != odt:
            print(f"FAIL {name}: dtypes spark={list(zip(spark_df.columns, sdt))} oracle={list(zip(ora_df.columns, odt))}")
            n_fail += 1; continue
        if len(spark_df) != len(ora_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(ora_df)}")
            n_fail += 1; continue
        if len(spark_df) == 0:
            print(f"WARN {name}: 0 rows (driver wants rows>0)")
        eq = spark_df.astype(str).equals(ora_df.astype(str))
        if not eq:
            diff = (spark_df.astype(str) != ora_df.astype(str)).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch, e.g.")
            for i in idx:
                print(f"  spark : {spark_df.loc[i].to_dict()}")
                print(f"  oracle: {ora_df.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
