#!/bin/bash
# Gate worker: compare a list of queries one at a time, waiting for each
# query's Verify output (_SUCCESS) to land first. Usage:
#   compare_worker.sh <sfdir> <outdir> <namesfile> <log>
set -u
SF="$1"; OUT="$2"; NAMES="$3"; LOG="$4"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
for q in $(cat "$NAMES"); do
  # wait up to 40 min for the Verify pass to produce this query
  for i in $(seq 1 240); do
    [ -f "$OUT/$q/_SUCCESS" ] && break
    sleep 10
  done
  if [ ! -f "$OUT/$q/_SUCCESS" ]; then
    echo "FAIL $q: verify output never appeared" >> "$LOG"
    continue
  fi
  # keep the FULL oracle map in place (a concurrently-finishing Verify
  # pass may overwrite it with a subset vintage). ORACLE_JSON points at a
  # pre-dumped full map (Verify <sf> <dir> __none__ writes it without
  # running any query).
  cp "${ORACLE_JSON:-/tmp/verify_new/oracle_sql.json}" "$OUT/oracle_sql.json" 2>/dev/null || true
  DUCKDB_THREADS=${DUCKDB_THREADS:-8} python3 "$REPO/tools/compare.py" "$SF" "$OUT" "$q" \
    | grep -E "^(ok|FAIL|WARN)" >> "$LOG"
done
echo "WORKER-DONE" >> "$LOG"
