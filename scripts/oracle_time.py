#!/usr/bin/env python3
"""Time each DuckDB oracle statement (exec+fetch only, no compare).
Usage: oracle_time.py <sfDir> <verifyOutDir> [nameRegex]
Prints per-query seconds sorted desc, then the total."""
import sys, json, re, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    pat = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    times = {}
    for name in sorted(oracle):
        if pat and not pat.search(name):
            continue
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchdf()
            times[name] = time.time() - t0
        except Exception as ex:
            times[name] = time.time() - t0
            print(f"{name}: ERROR {ex}")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{t:8.2f}  {name}")
    print(f"TOTAL: {sum(times.values()):.1f} s over {len(times)} queries")

if __name__ == "__main__":
    main()
