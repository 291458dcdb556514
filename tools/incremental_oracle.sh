#!/bin/bash
# Incrementally oracle-check completed Verify dumps while the engine
# sweep is still running. Polls VOUT for query dirs containing _SUCCESS
# that haven't been checked yet, stages them via symlink batches, and
# appends check_oracle output to LOG. Stops when DONEFILE exists and no
# new work remains.
# Usage: incremental_oracle.sh <vout> <sf_dir> <stage_root> <log> [donefile]
set -u
VOUT=$1; SF=$2; STAGE=$3; LOG=$4; DONEFILE=${5:-/nonexistent}
mkdir -p "$STAGE"
CHECKED="$STAGE/.checked"
touch "$CHECKED"
BATCH_N=0
while true; do
  NEW=()
  for d in "$VOUT"/*/; do
    name=$(basename "$d")
    [ -f "$d/_SUCCESS" ] || continue
    grep -qx "$name" "$CHECKED" && continue
    NEW+=("$name")
  done
  if [ ${#NEW[@]} -gt 0 ]; then
    BATCH_N=$((BATCH_N+1))
    B="$STAGE/batch_$BATCH_N"
    mkdir -p "$B"
    cp "$STAGE/oracle_sql.json" "$B/" 2>/dev/null || true
    for name in "${NEW[@]}"; do
      ln -sfn "$VOUT/$name" "$B/$name"
    done
    echo "== batch $BATCH_N: ${#NEW[@]} queries $(date -u +%H:%M:%S) ==" >> "$LOG"
    ORACLE_TIMEOUT_S=${ORACLE_TIMEOUT_S:-600} DUCKDB_THREADS=${DUCKDB_THREADS:-16} \
      python3 "$(dirname "$0")/check_oracle.py" "$B" "$SF" >> "$LOG" 2>&1
    for name in "${NEW[@]}"; do echo "$name" >> "$CHECKED"; done
    rm -rf "$B"
  elif [ -f "$DONEFILE" ]; then
    echo "== incremental oracle sweep complete $(date -u +%H:%M:%S) ==" >> "$LOG"
    break
  else
    sleep 30
  fi
done
