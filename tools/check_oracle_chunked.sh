#!/usr/bin/env bash
# Chunked oracle board: run check_oracle.py in bounded batches (fresh
# process per chunk) so large-scale table runs can't OOM one long-lived
# checker. usage: check_oracle_chunked.sh <sfDir> <outDir> [chunk=25]
set -uo pipefail
SF=$1; OUT=$2; CHUNK=${3:-25}
cd "$(dirname "$0")/.."
names=$(ls -d "$OUT"/*/ | xargs -n1 basename | sort)
total_pass=0; total_fail=0; fails=""
batch=""; n=0
run_batch() {
  [ -z "$batch" ] && return 0
  # per-chunk wall cap + temp hygiene: a quadratic oracle at scaled tables
  # must not wedge the whole board or fill the disk (classify_knn at 10x
  # spilled >50 GB of DuckDB temp). Timeout -> the chunk's entries rerun
  # ONE AT A TIME so only the intractable oracle is skipped.
  rm -rf /tmp/duckdb_oracle_tmp
  out=$(timeout "${CHUNK_TIMEOUT:-900}" python3 tools/check_oracle.py "$SF" "$OUT" "$batch" 2>&1 | tail -200)
  if [ $? -eq 124 ]; then
    echo "[chunk] TIMEOUT — retrying entries singly"
    for one in $(echo "$batch" | tr ',' ' '); do
      rm -rf /tmp/duckdb_oracle_tmp
      o1=$(timeout "${ENTRY_TIMEOUT:-300}" python3 tools/check_oracle.py "$SF" "$OUT" "$one" 2>&1 | tail -20)
      if [ $? -eq 124 ]; then
        echo "SKIP ORACLE-COST $one: DuckDB oracle intractable at this scale"
        fails="$fails $one(skip)"
      else
        p1=$(echo "$o1" | grep -c "^OK " || true)
        f1=$(echo "$o1" | grep -c "^FAIL" || true)
        total_pass=$((total_pass+p1)); total_fail=$((total_fail+f1))
        [ "$f1" -gt 0 ] && { echo "$o1" | grep "^FAIL"; fails="$fails $one"; }
      fi
    done
    return 0
  fi
  p=$(echo "$out" | grep -c "^OK " || true)
  f=$(echo "$out" | grep -c "^FAIL" || true)
  total_pass=$((total_pass+p)); total_fail=$((total_fail+f))
  [ "$f" -gt 0 ] && { echo "$out" | grep "^FAIL"; fails="$fails $(echo "$out" | grep '^FAIL' | awk '{print $3}')"; }
  echo "[chunk] +$p pass, +$f fail (running: $total_pass/$((total_pass+total_fail)))"
}
for name in $names; do
  batch="${batch:+$batch,}$name"; n=$((n+1))
  if [ $n -ge $CHUNK ]; then run_batch; batch=""; n=0; fi
done
run_batch
echo "== TOTAL: $total_pass pass, $total_fail fail =="
[ -n "$fails" ] && echo "failing:$fails"
exit $([ $total_fail -eq 0 ] && echo 0 || echo 1)
