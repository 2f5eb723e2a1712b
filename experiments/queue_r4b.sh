#!/bin/bash
# Round-4 follow-up TPU queue: the stages the first queue failed or
# could not run (chip busy), in evidence-value order:
#   1. re-run the on-chip Pallas suite with the seed-stable bridge
#      quantiles (tests/test_pallas.py fix — the round-4 failure was an
#      under-equilibrated statistic, not a kernel bug)
#   2. the FIXED roofline (the round-4 run timed async dispatch only)
#   3. cells pair-move rerun (resumes at batch 7 after the TPU device
#      error) + analysis
#   4. m71 control SMC (restores the misspec study's control arm, which
#      needs per-batch samples this machine never had) + misspec rerun
#   5. dc pooled base effort with --dump for per-image attribution of
#      the flat-in-effort cross-pipeline TVD gap
# Stages are independent; rc is logged and the queue moves on.
# /tmp/r4b_stop is the kill switch. Logs: /tmp/r4b_queue.log +
# /tmp/r4b_<stage>.log.
set -u
cd /root/repo

run_stage() {
  local name=$1 tmo=$2 dir=$3
  shift 3
  if [ -f /tmp/r4b_stop ]; then
    echo "$(date -u) stage $name SKIPPED (stop)" >> /tmp/r4b_queue.log
    return 125
  fi
  echo "$(date -u) stage $name (tmo=${tmo}s): $*" >> /tmp/r4b_queue.log
  (cd "$dir" && timeout --kill-after=60 "$tmo" "$@") \
    > "/tmp/r4b_${name}.log" 2>&1
  local rc=$?
  echo "$(date -u) stage $name rc=$rc" >> /tmp/r4b_queue.log
}

echo "$(date -u) queue r4b start" >> /tmp/r4b_queue.log

run_stage tpu_pallas 1800 /root/repo \
  env SMCDET_TEST_TPU=1 python -m pytest tests/test_pallas.py -q

run_stage roofline 1800 /root/repo \
  python experiments/roofline.py --updates-per-s 323818581.7632845

run_stage cells_pair_smc 2700 /root/repo/experiments/cells \
  python run_smc.py --config config_pair.yaml
run_stage cells_pair_analyze 1800 /root/repo/experiments/cells \
  python ../analyze.py output/cells_pair --method smc

run_stage m71_control_smc 2700 /root/repo/experiments/m71 \
  python run_smc.py
run_stage misspec_study 1800 /root/repo/experiments/m71 \
  python misspec_study.py

run_stage dc_pooled_dump 3600 /root/repo/experiments/divideandconquer \
  python compare_pooled.py --reps 8 --num-images 30 --dump \
  --suffix _dump

touch /tmp/r4b_queue.done
echo "$(date -u) queue r4b complete" >> /tmp/r4b_queue.log
