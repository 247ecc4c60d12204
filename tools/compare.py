#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run each oracle SQL in DuckDB over the sf parquet tables and compare with
the Spark result parquet written by graft.Verify.

Also measures PER-ORACLE DuckDB seconds and writes them to
<verifyOutDir>/oracle_times.json — round 15's correctness artifact came
back {} because three un-timed oracles cost 840 s of a 997 s total and
blew the driver's ~600 s compare budget. Copy the times file to
bench/ORACLE_TIMES.json and commit it: OracleBudgetSpec gates on it
(every oracle timed, each < 15 s, total < 300 s at sf0.01).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [onlyCsv]
"""
import sys, json, glob, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # sort columns by name, then rows by all columns (stringified)
    df = df[sorted(df.columns)]
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    times = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        pq = os.path.join(out_dir, name)
        files = glob.glob(pq + "/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = norm(con.sql(f"SELECT * FROM '{pq}/*.parquet'").df())
            t0 = time.time()
            ora_raw = con.sql(sql).df()
            times[name] = round(time.time() - t0, 3)
            ora_df = norm(ora_raw)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        tag = f"[{times[name]:7.2f}s]"
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
            print(f"PASS {tag} {name} ({len(spark_df)} rows)"); n_pass += 1
    total = sum(times.values())
    print(f"\n{n_pass} pass, {n_fail} fail")
    print(f"oracle wall: {total:.1f}s over {len(times)} oracles; slowest:")
    for name, sec in sorted(times.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {sec:7.2f}s  {name}")
    over = {n: s for n, s in times.items() if s > 15.0}
    if over:
        print(f"BUDGET VIOLATION: single-oracle >15s: {over}")
    if total > 300.0:
        print(f"BUDGET VIOLATION: total {total:.1f}s > 300s")
    if not only:  # partial runs must not masquerade as a full timing ledger
        with open(os.path.join(out_dir, "oracle_times.json"), "w") as f:
            json.dump({"total_sec": round(total, 1), "per_query": times},
                      f, indent=1, sort_keys=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
