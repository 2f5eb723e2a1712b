#!/bin/bash
# Round-4 on-chip validation queue (single TPU chip — strictly serial).
# Produces the round's first-party perf evidence:
#   1. on-chip Pallas kernel tests (first hardware validation of the
#      occupied-prefix kernels from round 3)
#   2. bench.py --quick (smoke: compile + small config)
#   3. bench.py full north star (332 tiles) -> /tmp/r4_bench_full.log
#      (queue_r4.sh's roofline stage reads the updates/s from this log)
#   4. streaming-pool sweep (--pool={14,28,42,56}) vs sorted chunking
# Markers: /tmp/r4_tpu_queue.done gates queue_r4.sh (CPU evidence queue).
# Logs: /tmp/r4_tpu_queue.log + per-stage /tmp/r4_<stage>.log.
set -u
cd /root/repo

log() { echo "$(date -u) $*" >> /tmp/r4_tpu_queue.log; }

run_stage() {
  local name=$1 tmo=$2
  shift 2
  log "stage $name: $*"
  timeout "$tmo" "$@" > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  log "stage $name rc=$rc"
  return $rc
}

log "tpu queue start"

# 1. on-chip Pallas tests (conftest forces CPU unless SMCDET_TEST_TPU=1)
run_stage tpu_pallas 1800 \
  env SMCDET_TEST_TPU=1 python -m pytest tests/test_pallas.py -q

# 2-3. headline bench: quick smoke, then the full north star
run_stage bench_quick 1800 python bench.py --quick
run_stage bench_full 2400 python bench.py

# 4. streaming-pool sweep on the full workload
for p in 14 28 42 56; do
  run_stage "stream_${p}" 2400 python bench.py --streaming --pool="$p"
done

touch /tmp/r4_tpu_queue.done
log "tpu queue complete"
