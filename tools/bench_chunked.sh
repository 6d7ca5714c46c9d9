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
# Partial re-measure sweeps must pass KEYS_FILE= explicitly (ADVICE r11:
# silently honoring a stale keys.txt left in a reused OUT dir pinned the
# sweep to an outdated surface and bench_merge couldn't even flag the
# missing keys). A pre-existing keys.txt is only reused when it still
# matches the declared surface (that keeps crash-resume chunk alignment
# safe); a stale one is a hard error.
if [[ -n "${KEYS_FILE:-}" ]]; then
  cp "$KEYS_FILE" "$OUT/keys.txt"
  echo "[bench_chunked] partial sweep: KEYS_FILE=$KEYS_FILE ($(wc -l < "$OUT/keys.txt") keys)"
elif [[ -s "$OUT/keys.txt" ]]; then
  tools/run.sh graft.Keys | cut -f1 > "$OUT/keys.current"
  if cmp -s "$OUT/keys.txt" "$OUT/keys.current"; then
    rm -f "$OUT/keys.current"
    echo "[bench_chunked] resuming: existing keys.txt matches the declared surface"
  else
    echo "[bench_chunked] ERROR: $OUT/keys.txt is STALE (differs from the declared surface)." >&2
    echo "  diff: $(diff "$OUT/keys.txt" "$OUT/keys.current" | head -5 | tr '\n' ' ')" >&2
    echo "  Delete $OUT (or its keys.txt) for a fresh full sweep, or pass KEYS_FILE= for a partial one." >&2
    exit 3
  fi
else
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
