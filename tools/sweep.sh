#!/bin/bash
# Serial measurement sweep over every bench mode (one process owns the TPU
# at a time — never run two entries concurrently). Appends one JSON line
# per mode to $OUT plus the stderr phase splits to $OUT.log.
# Usage: tools/sweep.sh [outfile]
set -u
OUT=${1:-/tmp/sweep_$(date +%H%M).jsonl}
LOG=$OUT.log
cd "$(dirname "$0")/.."
echo "[sweep] -> $OUT" >&2
run() {
  local label=$1; shift
  echo "=== $label ===" >>"$LOG"
  local line
  line=$(env "$@" timeout 2400 python bench.py 2>>"$LOG")
  echo "{\"config\": \"$label\", ${line#\{}" >>"$OUT"
  echo "[sweep] $label -> $line" >&2
}
python tools/probe_tunnel.py >>"$OUT" 2>>"$LOG"
run e2e_default        BENCH_MODE=e2e
run e2e_dq             BENCH_MODE=e2e BENCH_DQ=1
run e2e_beam5          BENCH_MODE=e2e BENCH_BEAM=5 BENCH_MINUTES=10
run e2e_beam5_int4     BENCH_MODE=e2e BENCH_BEAM=5 BENCH_KVQ=4 BENCH_MINUTES=10
run e2e_fallback       BENCH_MODE=e2e BENCH_FALLBACK=1 BENCH_MINUTES=10
run kernel             BENCH_MODE=kernel
run kernel_dq          BENCH_MODE=kernel BENCH_DQ=1
run align              BENCH_MODE=align BENCH_MINUTES=10
run align_words        BENCH_MODE=align_words BENCH_MINUTES=10
run refine             BENCH_MODE=refine BENCH_MINUTES=3
run locate             BENCH_MODE=locate BENCH_MINUTES=10
python tools/probe_tunnel.py >>"$OUT" 2>>"$LOG"
echo "[sweep] done" >&2
