#!/usr/bin/env python3
"""Bench regression canary: per-query ratio table between two bench
sidecars (the round-6 adjudication, scripted).

Box-state normalization: the machine's clean-run totals drift ±25%
between sessions, so RAW ratios mislead. scan_count (a constant-cost
full-scan count) is the box-state canary — every ratio is reported both
raw and normalized by the scan_count ratio. A query is flagged only
when its NORMALIZED ratio exceeds the threshold: that is plan
regression, not box noise.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [threshold=1.5]
Accepts either the bench one-liner ({"queries": {...}}) or a driver
BENCH_r*.json wrapper (whose "tail" holds a truncated queries blob —
recovered best-effort).
"""
import json, re, sys


def load_queries(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc["queries"]
    # driver wrapper: parse what survives in the truncated tail
    tail = doc.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9.]+)', tail)
    return {k: float(v) for k, v in pairs}


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = load_queries(old_path)
    new = load_queries(new_path)
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared queries between sidecars")
        return 1
    canary = "scan_count"
    box = (new.get(canary, 0) / old[canary]) if old.get(canary) else 1.0
    rows = []
    for q in shared:
        if old[q] <= 0:
            continue
        raw = new[q] / old[q]
        rows.append((q, old[q], new[q], raw, raw / box))
    rows.sort(key=lambda r: -r[4])
    import statistics
    med_raw = statistics.median(r[3] for r in rows)
    med_norm = statistics.median(r[4] for r in rows)
    print(f"shared={len(rows)}  box_canary({canary})={box:.3f}  "
          f"median_raw={med_raw:.3f}  median_normalized={med_norm:.3f}")
    flagged = [r for r in rows if r[4] > threshold]
    print(f"\n{'query':32} {'old_s':>8} {'new_s':>8} {'raw':>6} {'norm':>6}")
    for q, o, n, raw, norm in (flagged if flagged else rows[:10]):
        mark = " <-- REGRESSION" if norm > threshold else ""
        print(f"{q:32} {o:8.3f} {n:8.3f} {raw:6.2f} {norm:6.2f}{mark}")
    if not flagged:
        print(f"\nno query exceeds normalized {threshold}x "
              "(top 10 by normalized ratio shown)")
    return 2 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
