#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: compare graft.Verify output
against DuckDB running the oracle SQL on the same parquet tables.

Mimics the driver's pandas-based, representation-sensitive hasher
(VERDICT r1): Spark side loaded with pandas.read_parquet, oracle side
with duckdb .df(), columns sorted by name, rows sorted by values
(driver stack traces show DataFrame.sort_values), then cell-wise
compare of type-tagged reprs — so Decimal('253942.00') vs float
253942.0 FAILS here exactly like it fails the driver, and complex
(ndarray/dict) cells are rejected like the driver's factorize crash.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob, decimal, datetime
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class Unhashable(Exception):
    pass


def fmt(v):
    """Type-tagged repr of one cell, matching what a pandas-value hasher
    distinguishes. Ints compare by value across widths (int8==int64);
    float vs int vs Decimal vs str stay distinct."""
    if v is None:
        return "NULL"
    if isinstance(v, (np.ndarray, list, dict, tuple)):
        raise Unhashable(type(v).__name__)
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        if np.isnan(v):
            return "NULL"
        return f"f:{float(v)!r}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    # fn_date passed the driver in r1 with spark date32 (object datetime.date)
    # vs duck DATE→datetime64[us]: the driver equates a date with its
    # midnight timestamp, so normalize both to the same tag here.
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.datetime):
        # pd.NaT passes isinstance(datetime) — a NULL DATE surfaces as
        # object-None on the Spark side (date32) but NaT on the duck
        # side (datetime64); both are NULL the value level
        if pd.isna(v):
            return "NULL"
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"ts:{v.isoformat()}T00:00:00"
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, (str, np.str_)):
        return f"s:{v}"
    if isinstance(v, (bytes, np.bytes_)):
        return f"y:{v!r}"
    return f"{type(v).__name__}:{v!r}"


def frame_cells(df):
    df = df[sorted(df.columns)]
    if len(df):
        try:
            df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        except TypeError as e:
            raise Unhashable(str(e))
    return [tuple(fmt(v) for v in row) for row in df.itertuples(index=False)]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            sdf = pd.read_parquet(files[0])
            ddf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        try:
            sr = frame_cells(sdf)
        except Unhashable as e:
            print(f"FAIL {name}: spark side unhashable cell ({e}) — driver would crash")
            n_fail += 1
            continue
        try:
            dr = frame_cells(ddf)
        except Unhashable as e:
            print(f"FAIL {name}: oracle side unhashable cell ({e}) — driver would crash")
            n_fail += 1
            continue
        if sr == dr:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            sdt = {c: str(sdf[c].dtype) for c in s_cols}
            ddt = {c: str(ddf[c].dtype) for c in d_cols}
            if sdt != ddt:
                print(f"  dtypes spark={sdt}")
                print(f"  dtypes duck ={ddt}")
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    print(f"    cols ={s_cols}")
                    break
            else:
                if len(sr) != len(dr):
                    which = sr if len(sr) > len(dr) else dr
                    print(f"  extra row: {which[min(len(sr), len(dr))]}")
            n_fail += 1
    # rows-only keys (declared without an oracle): the driver records a
    # rows>0 check — and crashes like t2 on unhashable cells, so probe
    # both here too
    for d in sorted(os.listdir(out_dir)):
        res_dir = f"{out_dir}/{d}"
        if d in oracle or not os.path.isdir(res_dir):
            continue
        if only and d not in only:
            continue
        files = glob.glob(f"{res_dir}/*.parquet")
        try:
            sdf = pd.read_parquet(files[0]) if files else None
            if sdf is None or not len(sdf):
                print(f"FAIL {d} (rows-only): empty result")
                n_fail += 1
                continue
            frame_cells(sdf)
            print(f"PASS {d} (rows-only, {len(sdf)} rows)")
            n_pass += 1
        except Unhashable as e:
            print(f"FAIL {d} (rows-only): unhashable cell ({e})")
            n_fail += 1
        except Exception as e:
            print(f"FAIL {d} (rows-only): {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
