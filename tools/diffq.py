#!/usr/bin/env python3
"""Cell-level differ for one query: spark verify parquet vs DuckDB oracle.
Usage: python3 tools/diffq.py <sfDir> <verifyOutDir> <query> [maxrows]
Prints the first differing rows side by side (columns sorted, rows
sorted by values — same canonicalization as tools/check.py)."""
import sys, glob, json
import duckdb
import pandas as pd

sf, vout, q = sys.argv[1], sys.argv[2], sys.argv[3]
maxrows = int(sys.argv[4]) if len(sys.argv) > 4 else 8

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{vout}/oracle_sql.json"))[q]
duck = con.execute(oracle).df()
spark = pd.read_parquet(sorted(glob.glob(f"{vout}/{q}/*.parquet")))


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


s, d = canon(spark), canon(duck)
print(f"spark {len(s)} rows, duck {len(d)} rows; cols s={list(s.columns)} d={list(d.columns)}")
n = 0
for i in range(max(len(s), len(d))):
    rs = s.iloc[i].to_dict() if i < len(s) else None
    rd = d.iloc[i].to_dict() if i < len(d) else None
    if rs is None or rd is None or any(repr(rs[c]) != repr(rd[c]) for c in s.columns):
        print(f"--- row {i}\n  spark: {rs}\n  duck : {rd}")
        n += 1
        if n >= maxrows:
            break
if n == 0:
    print("no repr-level differences (hash mismatch may be dtype-level)")
    print(s.dtypes.to_dict(), d.dtypes.to_dict())
