#!/usr/bin/env python3
"""Merge tools/bench_chunked.sh chunk files into one graft.Bench-shaped
JSON line (consumable by tools/sf10_report.py). Keys whose chunk
crashed before writing its file are reported as missing."""
import glob
import json
import sys

out_dir = sys.argv[1]
queries, failures = {}, {}
sf, n_passes = None, None
for f in sorted(glob.glob(f"{out_dir}/chunk_*.json")):
    c = json.load(open(f))
    queries.update(c["queries"])
    failures.update(c["failures"])
    sf, n_passes = c["sf"], c["n_passes"]
declared = [l.strip().split("\t")[0] for l in open(f"{out_dir}/keys.txt") if l.strip()]
missing = [k for k in declared if k not in queries and k not in failures]
for k in missing:
    failures[k] = "chunk crashed before this query ran"
total = sum(queries.values())
print(json.dumps({
    "metric": "total", "value": total, "unit": "sec",
    "n_passes": n_passes, "n_failed": len(failures),
    "failures": failures, "queries": queries, "sf": sf,
}, separators=(",", ":")))
