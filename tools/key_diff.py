#!/usr/bin/env python3
"""Gate: SURVEY.md §2 must enumerate every key the Registry declares.

Usage:
    tools/run.sh graft.Keys > /tmp/keys.txt
    python3 tools/key_diff.py [/tmp/keys.txt]

Exits 0 iff every declared key appears (as a backticked identifier)
inside SURVEY.md's §2 section. Prints any drift in both directions;
the reverse direction (§2 mentions without a Registry entry) is a
WARNING only, because §2 legitimately backticks column names, conf
keys, and function names.
"""
import re
import subprocess
import sys

keys_file = sys.argv[1] if len(sys.argv) > 1 else None
if keys_file:
    lines = open(keys_file).read().splitlines()
else:
    out = subprocess.run(
        ["tools/run.sh", "graft.Keys"], capture_output=True, text=True, check=True
    ).stdout
    lines = out.splitlines()

declared = {l.split("\t")[0] for l in lines if "\t" in l}
assert declared, "no declared keys parsed — run sbt compile first?"

survey = open("SURVEY.md").read()
m = re.search(r"^## §2 .*?(?=^## §3 )", survey, re.S | re.M)
assert m, "SURVEY.md §2 section not found"
s2_ticks = set(re.findall(r"`([a-z0-9_]+)`", m.group(0)))

missing = sorted(declared - s2_ticks)
if missing:
    print(f"FAIL: {len(missing)} declared keys missing from SURVEY §2:")
    for k in missing:
        print("  ", k)
    sys.exit(1)

# reverse: §2 ticks that LOOK like query keys but aren't declared
suspicious = sorted(
    t for t in s2_ticks - declared
    if re.match(r"^(tpch_|b\d+_|agg_|join_|dedup_|text_|ts_|stats_|stream_)", t)
    and t not in {"b1", "b2", "b3", "b5", "b7"}  # §2B family prefixes
)
if suspicious:
    print(f"WARN: {len(suspicious)} §2 key-shaped mentions not declared: {suspicious}")

print(f"OK: all {len(declared)} declared keys enumerated in SURVEY §2")
