#!/usr/bin/env python3
"""Learn a deterministic BPE merge table from a documents fixture.

The tokenizer is a FIXTURE-TIME ARTIFACT (like a real pipeline's
tokenizer.json): merges are learned ONCE from the sf0.01 corpus and
pinned as constants in graft.queries.BpeOps (Scala literal) and its
DuckDB oracle SQL (list-of-lists literal). Re-running this script on
the same fixture reproduces the same table bit-for-bit.

Learning rule (classic Sennrich-style BPE over word frequencies):
  - words = whitespace tokens of lower(text), weighted by corpus count
  - repeat N times: count adjacent token-pair frequencies across the
    weighted vocabulary; merge the most frequent pair, ties broken by
    (left, right) lexicographic ascending (total order -> deterministic)

Application rule (what BOTH engines implement): merges applied in rank
order, each merge = ONE left-to-right greedy pass over the token list.

Usage: python3 tools/learn_bpe.py [sfDir] [n_merges]
Prints the merge table as a Scala Seq literal and a DuckDB list literal.
"""
import sys
from collections import Counter

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 32

con = duckdb.connect()
rows = con.execute(
    f"""SELECT w, count(*) AS c FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS w
          FROM '{sf}/documents.parquet') WHERE w <> '' GROUP BY 1"""
).fetchall()

vocab = {tuple(w): c for w, c in rows}  # word as tuple of 1-char tokens

def apply_merge(toks, left, right):
    out = []
    for t in toks:
        if out and out[-1] == left and t == right:
            out[-1] = left + right
        else:
            out.append(t)
    return tuple(out)

merges = []
for _ in range(n_merges):
    pairs = Counter()
    for toks, c in vocab.items():
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] += c
    if not pairs:
        break
    # max count, ties -> lexicographically smallest (left, right)
    best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    merges.append(best)
    vocab = {apply_merge(t, *best): c for t, c in vocab.items()}
    # re-aggregate in case two words collapse to the same tokenization
    agg = Counter()
    for t, c in vocab.items():
        agg[t] += c
    vocab = dict(agg)

print("// Scala (graft.queries.BpeOps.MERGES):")
print("Seq(" + ", ".join(f'("{a}", "{b}")' for a, b in merges) + ")")
print()
print("-- DuckDB literal:")
print("[" + ", ".join(f"['{a}', '{b}']" for a, b in merges) + "]")
print()
print("sample tokenizations after all merges:")
for t, c in sorted(vocab.items(), key=lambda kv: -kv[1])[:12]:
    print("  ", "|".join(t), c)
