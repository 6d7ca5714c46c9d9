#!/usr/bin/env python3
"""Fold a full-surface sf10 bench run against the repo's sf0.1 bench
sidecar into the per-decade exponent table BASELINE.md §sf10-full wants.

Usage: python3 tools/sf10_report.py /tmp/sf10bench/out.log [topN] [sf01_sidecar]
Reads the FIRST json line of the sf10 run (full per-query map) and
the sf0.1 per-query sidecar (default bench_per_query.json, the driver
round artifact; pass a fresh graft.Bench output when new keys are not
in the driver artifact yet). exp/decade =
log10(t_sf10 / t_sf01) / 2; < 1.0 = sub-linear over two decades.
"""
import json
import math
import sys

sf10_log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10bench/out.log"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
sf01_path = sys.argv[3] if len(sys.argv) > 3 else "bench_per_query.json"

line10 = next(l for l in open(sf10_log) if l.startswith('{"metric"'))
b10 = json.loads(line10)
b01 = json.load(open(sf01_path))

q10, q01 = b10["queries"], b01["queries"]
common = sorted(set(q10) & set(q01))
rows = []
for k in common:
    t0, t1 = q01[k], q10[k]
    ratio = t1 / t0 if t0 > 0 else float("inf")
    exp = math.log10(ratio) / 2 if ratio > 0 else 0.0
    rows.append((k, t0, t1, ratio, exp))

n_sub = sum(1 for r in rows if r[4] < 1.0)
n_super = [r for r in rows if r[4] >= 1.0]
print(f"sf10 full-surface: {len(common)} queries, total {b10['value']:.1f}s "
      f"(sf0.1 total {b01['value']:.1f}s), n_failed={b10['n_failed']}, "
      f"passes={b10['n_passes']}")
print(f"sub-linear (exp<1.0): {n_sub}/{len(common)}")
if n_super:
    print("AT-OR-ABOVE-LINEAR rows:")
    for k, t0, t1, ratio, exp in sorted(n_super, key=lambda r: -r[4]):
        print(f"  {k}: {t0:.2f}s -> {t1:.2f}s ({ratio:.1f}x, exp {exp:.2f})")
if b10.get("failures"):
    print("failures:", b10["failures"])
print(f"\nslowest {top_n} at sf10:")
print("| query | sf0.1 s | sf10 s | 100x ratio | exp/decade |")
print("|---|---|---|---|---|")
for k, t0, t1, ratio, exp in sorted(rows, key=lambda r: -r[2])[:top_n]:
    print(f"| {k} | {t0:.2f} | {t1:.2f} | {ratio:.1f}x | {exp:.2f} |")
