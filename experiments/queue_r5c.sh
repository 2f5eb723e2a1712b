#!/bin/bash
# Round-5 evidence queue, part C: the second-draw m71 arm (seed 6839).
# Measures draw-to-draw variation of the m71 calibration metrics, the
# quantity the residual-decomposition discussion invokes to bound the
# remaining exact-truth 0.90-vs-0.94 coverage gap. Commits its own
# artifacts per stage (VERDICT r4 task 6 pattern).
set -u
cd /root/repo
QLOG=docs/results/QUEUE_r5.md

note() { echo "- $(date -u +%H:%M:%S) $*" >> "$QLOG"; }

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

note "queue r5c start (second-draw m71 arm, seed 6839)"

run_stage m71_seed2_fixture 2400 experiments/m71 \
  python make_fixture.py --data-dir data_seed2 --seed 6839 \
  || exit 1
run_stage m71_seed2_prep 2400 experiments/m71 \
  python prepare_data.py --no-download --data-dir data_seed2 \
  || exit 1
run_stage m71_seed2_smc 7200 experiments/m71 \
  python run_smc.py --config config_seed2.yaml \
  || exit 1
run_stage m71_seed2_analyze 2400 experiments/m71 \
  python ../analyze.py output/m71_seed2 --method smc --no-figures \
  --tiles data_seed2/m71/tiles.npz
run_stage m71_seed2_analyze_exact 2400 experiments/m71 \
  python ../analyze.py output/m71_seed2 --method smc \
  --tiles data_seed2/m71/tiles_exact.npz --no-figures
cp experiments/m71/output/m71_seed2/smc_analysis.json \
   docs/results/m71/smc_analysis_seed2.json 2>/dev/null
cp experiments/m71/output/m71_seed2/smc_analysis_exact.json \
   docs/results/m71/smc_analysis_seed2_exact.json 2>/dev/null
{
  echo '  - m71 draw-to-draw (seed 6838 r5 rerun vs seed 6839):'
  python - <<'PY'
import json
a = json.load(open('docs/results/m71/smc_analysis_r5.json'))
ax = json.load(open('docs/results/m71/smc_analysis_exact.json'))
b = json.load(open('docs/results/m71/smc_analysis_seed2.json'))
bx = json.load(open('docs/results/m71/smc_analysis_seed2_exact.json'))
print(f"    scattered: coverage95 {a['total_flux_coverage']['0.95']} -> "
      f"{b['total_flux_coverage']['0.95']}; SBC p "
      f"{a['sbc_total_flux_ks_pvalue']} -> {b['sbc_total_flux_ks_pvalue']}")
print(f"    exact:     coverage95 {ax['total_flux_coverage']['0.95']} -> "
      f"{bx['total_flux_coverage']['0.95']}; SBC p "
      f"{ax['sbc_total_flux_ks_pvalue']} -> {bx['sbc_total_flux_ks_pvalue']}")
PY
} >> "$QLOG" 2>&1
commit_stage "Record the second-draw m71 arm (draw-to-draw variation)" \
  docs/results/m71/smc_analysis_seed2.json \
  docs/results/m71/smc_analysis_seed2_exact.json

note "queue r5c done"
commit_stage "Close the r5c queue log"
