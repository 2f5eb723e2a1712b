#!/bin/bash
# Round-5 on-chip evidence queue. Unlike the round-4 queues (whose
# results died in /tmp — VERDICT r4 weak #4/task 6), every stage copies
# its artifacts into docs/results/ and commits them on success, so the
# tree is clean and the evidence is in git whenever the round snapshots.
#
# Stages, in evidence-value order:
#   1. cells_pair: the full 200-image pair-move run (VERDICT r4 task 2's
#      still-open criterion), now viable via the packed kernel layout +
#      dispatch_iters segmentation (the round-4 "TPU device error" was
#      the environment's ~200 s dispatch kill limit — docs/PERF.md)
#   2. m71 baseline rerun + scatter-free-truth re-analysis (tiles_exact)
#   3. m71 no-giants ablation + shared-tile comparison (r4 task 7)
#   4. bridge q50 sweeps curve (r4 task 4)
#   5. on-chip Pallas suite (regression)
#   6. bench quick + full (BENCH evidence in git, not just the driver)
#
# /tmp/r5_stop is the kill switch. Log: docs/results/QUEUE_r5.md
# (committed per stage) + /tmp/r5_<stage>.log (full stdout).
set -u
cd /root/repo
QLOG=docs/results/QUEUE_r5.md
[ -f "$QLOG" ] || printf '# Round-5 evidence queue log\n\n' > "$QLOG"

note() {
  echo "- $(date -u +%H:%M:%S) $*" >> "$QLOG"
}

commit_stage() {
  local msg=$1
  shift
  git add "$QLOG" "$@" 2>> /tmp/r5_git.log
  git commit -q -m "$msg" >> /tmp/r5_git.log 2>&1 || true
}

run_stage() {
  local name=$1 tmo=$2 dir=$3
  shift 3
  if [ -f /tmp/r5_stop ]; then
    note "stage $name SKIPPED (stop flag)"
    return 125
  fi
  note "stage $name START (tmo=${tmo}s): $*"
  (cd "$dir" && timeout --kill-after=60 "$tmo" "$@") \
    > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  note "stage $name rc=$rc"
  return $rc
}

# ---- 1. cells pair-move study ----------------------------------------
if run_stage cells_pair_smc 7200 experiments/cells \
    python run_smc.py --config config_pair.yaml; then
  run_stage cells_pair_analyze 2400 experiments/cells \
    python ../analyze.py output/cells_pair --method smc
  mkdir -p docs/results/cells
  cp experiments/cells/output/cells_pair/smc_analysis.json \
     docs/results/cells/pair_smc_analysis.json 2>/dev/null
  {
    echo '  - cells_pair asymmetry vs base:'
    python - <<'PY'
import json
pair = json.load(open('experiments/cells/output/cells_pair/smc_analysis.json'))
base = json.load(open('docs/results/cells/smc_analysis.json'))
print(f"    base asymmetry {base['confusion_asymmetry']}, "
      f"pair {pair['confusion_asymmetry']}; "
      f"base count_accuracy {base['count_accuracy']}, "
      f"pair {pair['count_accuracy']}; "
      f"pair SBC p {pair['sbc_total_flux_ks_pvalue']}, "
      f"coverage95 {pair['total_flux_coverage']['0.95']}")
PY
  } >> "$QLOG" 2>&1
  commit_stage "Record the completed cells pair-move study (200 images)" \
    docs/results/cells/pair_smc_analysis.json
fi

# ---- 2. m71 baseline + exact-truth re-analysis ------------------------
if run_stage m71_base_smc 7200 experiments/m71 python run_smc.py; then
  run_stage m71_base_analyze 2400 experiments/m71 \
    python ../analyze.py output/m71 --method smc
  run_stage m71_exact_analyze 2400 experiments/m71 \
    python ../analyze.py output/m71 --method smc \
    --tiles data/m71/tiles_exact.npz --out-suffix _exact --no-figures
  cp experiments/m71/output/m71/smc_analysis.json \
     docs/results/m71/smc_analysis_r5.json 2>/dev/null
  cp experiments/m71/output/m71/smc_analysis_exact.json \
     docs/results/m71/smc_analysis_exact.json 2>/dev/null
  commit_stage "Record the m71 rerun + scatter-free-truth re-analysis" \
    docs/results/m71/smc_analysis_r5.json \
    docs/results/m71/smc_analysis_exact.json
fi

# ---- 3. m71 no-giants ablation ----------------------------------------
if run_stage m71_nogiants_smc 7200 experiments/m71 \
    python run_smc.py --config config_nogiants.yaml; then
  run_stage m71_nogiants_analyze 2400 experiments/m71 \
    python ../analyze.py output/m71_nogiants --method smc --no-figures
  run_stage m71_nogiants_compare 1200 experiments/m71 \
    python compare_nogiants.py
  cp experiments/m71/output/m71_nogiants/smc_analysis.json \
     docs/results/m71/nogiants_smc_analysis.json 2>/dev/null
  cp experiments/m71/output/nogiants_comparison.json \
     docs/results/m71/nogiants_comparison.json 2>/dev/null
  commit_stage "Record the m71 no-giants ablation run" \
    docs/results/m71/nogiants_smc_analysis.json \
    docs/results/m71/nogiants_comparison.json
fi

# ---- 4. bridge q50 sweeps curve ---------------------------------------
if run_stage bridge_q50 5400 /root/repo \
    python experiments/bridge_q50_curve.py; then
  commit_stage "Record the fused-bridge q50-vs-sweeps curve" \
    docs/results/bridge_q50_curve.json
fi

# ---- 5. on-chip Pallas suite ------------------------------------------
run_stage tpu_pallas 2400 /root/repo \
  env SMCDET_TEST_TPU=1 python -m pytest tests/test_pallas.py -q
tail -2 "/tmp/r5_tpu_pallas.log" | sed 's/^/    /' >> "$QLOG"
commit_stage "Record the round-5 on-chip Pallas suite result"

# ---- 6. bench ----------------------------------------------------------
if run_stage bench_quick 1800 /root/repo python bench.py --quick; then
  tail -1 /tmp/r5_bench_quick.log >> "$QLOG"
fi
if run_stage bench_full 1800 /root/repo python bench.py; then
  tail -1 /tmp/r5_bench_full.log >> "$QLOG"
fi
commit_stage "Record round-5 bench capture in the queue log"

note "queue r5 done"
commit_stage "Close the round-5 evidence queue log"
