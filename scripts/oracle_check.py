#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL, compare column-sorted/row-sorted
values exactly. Usage: oracle_check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, re
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    pat = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    fails = []
    for name in sorted(oracle):
        if pat and not pat.search(name):
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetchdf()
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"{name}: MISSING spark output"); fails.append(name); continue
            got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
            e, g = canon(exp), canon(got)
            if list(e.columns) != list(g.columns):
                print(f"{name}: COLS oracle={list(e.columns)} spark={list(g.columns)}")
                fails.append(name); continue
            if e.shape != g.shape:
                print(f"{name}: SHAPE oracle={e.shape} spark={g.shape}")
                fails.append(name); continue
            if not e.equals(g):
                neq = (e != g) & ~(e.isna() & g.isna())
                ncell = int(neq.values.sum())
                print(f"{name}: VALUES {ncell} cells differ "
                      f"(dtypes e={dict(e.dtypes.astype(str))} g={dict(g.dtypes.astype(str))})")
                idx = neq.any(axis=1)
                print("  oracle:", e[idx].head(3).to_dict("records"))
                print("  spark: ", g[idx].head(3).to_dict("records"))
                fails.append(name); continue
            print(f"{name}: OK {e.shape[0]}x{e.shape[1]}")
        except Exception as ex:
            print(f"{name}: ERROR {ex}"); fails.append(name)
    # rows-only entries: report row counts
    import os
    for p in sorted(glob.glob(f"{outdir}/*/")):
        name = p.rstrip("/").split("/")[-1]
        if name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{p}*.parquet'").fetchone()[0]
                print(f"{name}: rows-only, {n} rows")
            except Exception as ex:
                print(f"{name}: rows-only ERROR {ex}")
    print("FAILED:", fails if fails else "none")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
