#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: compare graft.Verify output
against DuckDB running the oracle SQL on the same parquet tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Normalize values for hash-style compare: Decimal -> str, float -> repr
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


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
            spark_rel = con.sql(f"SELECT * FROM '{files[0]}'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM '{files[0]}'").fetchall()
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            # re-project in sorted column order, preserving row order
            duck_rows = con.sql(
                f"SELECT {', '.join(duck_cols)} FROM ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        sr = [tuple(norm(v) for v in r) for r in spark_rows]
        dr = [tuple(norm(v) for v in r) for r in duck_rows]
        if sr == dr:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    print(f"    cols ={duck_cols}")
                    break
            else:
                if len(sr) != len(dr):
                    which = sr if len(sr) > len(dr) else dr
                    print(f"  extra row: {which[min(len(sr), len(dr))]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
