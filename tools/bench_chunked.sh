#!/bin/bash
# Full-surface bench sweep with a fresh JVM per chunk of queries, so a
# single OOM/crash voids only its chunk (the r9s2 one-JVM sf10 sweep
# lost 120/339 rows to one SparkContext shutdown). Chunks that already
# have an output file are skipped — rerunning after a crash resumes.
#
# Usage: tools/bench_chunked.sh <sfDir> <outDir> [chunkSize]
set -uo pipefail
SF="$1"; OUT="$2"; CHUNK="${3:-12}"
mkdir -p "$OUT"
cd /root/repo
# a pre-existing keys.txt is honored (partial re-measure sweeps seed it
# with just the keys to run); delete it to re-derive the full surface
if [[ ! -s "$OUT/keys.txt" ]]; then
  tools/run.sh graft.Keys | cut -f1 > "$OUT/keys.txt"
fi
TOTAL=$(wc -l < "$OUT/keys.txt")
i=0
while read -r -a NAMES; do
  i=$((i+1))
  F="$OUT/chunk_$(printf %03d $i).json"
  if [[ -s "$F" ]]; then echo "[bench_chunked] chunk $i cached"; continue; fi
  echo "[bench_chunked] chunk $i (${NAMES[0]}..${NAMES[-1]})"
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
    tools/run.sh graft.BenchChunk "$SF" "$F" "${NAMES[@]}" \
    > "$OUT/chunk_$(printf %03d $i).log" 2>&1 || \
    echo "[bench_chunked] chunk $i CRASHED (see log)"
done < <(xargs -n "$CHUNK" < "$OUT/keys.txt")
python3 tools/bench_merge.py "$OUT" > "$OUT/out.log"
tail -1 "$OUT/out.log"
echo "[bench_chunked] done: $TOTAL keys, merged -> $OUT/out.log"
