#!/usr/bin/env python3
"""Synthesize the NULL-injected adversarial corpus (VERDICT r8 item 9).

The driver fixtures carry no NULLs, so the 279-row oracle surface has
never been differentially exercised on NULL data. This writes a copy
of an sf dir with DETERMINISTIC null injection (key-modulus slices) on
columns a real pipeline plausibly leaves null — measure columns, FK
columns, group-key strings, document text, whole embeddings — while
primary keys stay intact so join topology remains sane.

Both engines read the SAME files, so every surviving hash mismatch is
a genuine NULL-semantics divergence between the Spark query and its
DuckDB oracle twin.

Usage: python3 tools/make_nulled.py [srcDir] [outDir]
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf0.01_nulled"

RULES = {
    # table: list of (column, modulus-on-first-key, remainder)
    "region":   [],
    "nation":   [],
    "customer": [("c_acctbal", 23, 0), ("c_mktsegment", 29, 1),
                 ("c_nationkey", 101, 2)],
    "supplier": [("s_acctbal", 23, 0), ("s_name", 31, 1)],
    "part":     [("p_retailprice", 23, 0), ("p_brand", 29, 1), ("p_size", 31, 2)],
    "orders":   [("o_totalprice", 23, 0), ("o_orderpriority", 29, 1),
                 ("o_custkey", 37, 2), ("o_orderdate", 97, 3)],
    "lineitem": [("l_discount", 23, 0), ("l_returnflag", 29, 1),
                 ("l_tax", 31, 2), ("l_shipdate", 97, 3)],
    "events":   [("value", 23, 0), ("event_type", 29, 1), ("user_id", 37, 2),
                 ("props", 31, 3)],
    "documents": [("text", 23, 0), ("lang", 29, 1), ("source", 31, 2)],
    "embeddings": [("embedding", 23, 0), ("label", 29, 1)],
}
KEY = {
    "region": "r_regionkey", "nation": "n_nationkey", "customer": "c_custkey",
    "supplier": "s_suppkey", "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey", "events": "event_id", "documents": "doc_id",
    "embeddings": "vec_id",
}

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
for t, rules in RULES.items():
    cols = [c[0] for c in
            con.execute(f"describe select * from '{src}/{t}.parquet'").fetchall()]
    nulled = {c: (m, r) for c, m, r in rules}
    sel = []
    for c in cols:
        if c in nulled:
            m, r = nulled[c]
            sel.append(f"CASE WHEN {KEY[t]} % {m} = {r} THEN NULL ELSE {c} END AS {c}")
        else:
            sel.append(c)
    con.execute(
        f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet') "
        f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"select count(*) from '{out}/{t}.parquet'").fetchone()[0]
    nn = {c: con.execute(
        f"select count(*) from '{out}/{t}.parquet' where {c} is null").fetchone()[0]
        for c in nulled}
    print(t, n, "nulls:", nn)
