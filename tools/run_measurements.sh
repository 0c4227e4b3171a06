#!/bin/bash
# Round-5 TPU measurement queue. Waits (bounded) for a healthy tunnel
# window, then runs every pending measurement back-to-back so one healthy
# window is never wasted. One process owns the TPU: run this alone.
#
#   nohup bash tools/run_measurements.sh > /tmp/meas_r5.log 2>&1 &
#   echo $! > /tmp/meas.pid
#
# Outputs land in tools/measurements_r5/*.log + BENCH_r05 candidates.
set -u
cd "$(dirname "$0")/.."
OUT=tools/measurements_r5
mkdir -p "$OUT"
export MALLOC_MMAP_THRESHOLD_=268435456 MALLOC_TRIM_THRESHOLD_=268435456

WAIT_HOURS=${WAIT_HOURS:-6}
deadline=$(( $(date +%s) + WAIT_HOURS * 3600 ))

probe() { timeout 300 python tools/probe_tunnel.py 2>/dev/null | tail -1; }

echo "[queue] waiting for healthy tunnel (budget ${WAIT_HOURS}h)"
while true; do
  line=$(probe)
  echo "[queue] $(date +%H:%M:%S) $line"
  case "$line" in *'"healthy": true'*) break;; esac
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "[queue] wait budget exhausted — proceeding on degraded tunnel"
    break
  fi
  sleep 300
done

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[queue] ==== $name start $(date +%H:%M:%S) ===="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "[queue] ==== $name done rc=$? $(date +%H:%M:%S) ===="
  tail -5 "$OUT/$name.log"
}

# 1. Product decode-step ablation incl. fused epilogue (target <=6.4 ms/step)
run product_step 2400 python tools/probe_product.py large-v3 32 192

# 2. Headline e2e large-v3 b32 (target >=230 xRT, host-phase split in JSON)
run bench_e2e 3600 env BENCH_MODE=e2e BENCH_BATCH=32 BENCH_MODEL=large-v3 python bench.py

# 3. turbo e2e (host-share target <15% of wall)
run bench_turbo 3600 env BENCH_MODE=e2e BENCH_BATCH=32 BENCH_MODEL=turbo python bench.py

# 4. Beam=5: int8 default and int4 cross-KV (target >=120 xRT)
run beam_int8 3600 env BENCH_MODE=e2e BENCH_BATCH=32 BENCH_MODEL=large-v3 BENCH_BEAM=5 python bench.py
run beam_int4 3600 env BENCH_MODE=e2e BENCH_BATCH=32 BENCH_MODEL=large-v3 BENCH_BEAM=5 BENCH_KVQ=4 python bench.py

# 5. Refine phase split (where does a bisection round's wall go)
run refine_phase 2400 python tools/probe_refine.py large-v3 3

echo "[queue] all measurements complete $(date +%H:%M:%S)"
