#!/bin/bash
# Round-5 evidence queue, part D: the crowded-tile budget probe.
# The r5c second-draw arm found a posterior flux UNDERestimate against
# exact truth concentrated on 3-4-true-star tiles (mean SBC rank 0.64);
# this queue re-runs those 156 tiles at 2x sweeps and at 4x particles to
# decide whether the residual is sampler resolution or a model/fixture
# property (experiments/m71/crowded_budget_probe.py). Commits its own
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

note "queue r5d start (crowded-tile budget probe, seed-6839 fixture)"

run_stage crowded_hiS_smc 5400 experiments/m71 \
  python run_smc.py --config config_seed2_crowded_hiS.yaml
run_stage crowded_hiN_smc 5400 experiments/m71 \
  python run_smc.py --config config_seed2_crowded_hiN.yaml
run_stage crowded_compare 1200 experiments/m71 \
  python crowded_budget_probe.py --compare
{
  echo '  - crowded budget probe (mean SBC rank, exact truth, 156 tiles):'
  python - <<'PY'
import json
d = json.load(open('docs/results/m71/crowded_budget_probe.json'))
for k, v in d['arms'].items():
    if isinstance(v, str):
        print(f"    {k}: {v}")
    else:
        print(f"    {k}: mean rank {v['mean_sbc_rank']} "
              f"+/- {v['sbc_rank_stderr']}, cov95 {v['coverage']['0.95']}")
PY
} >> "$QLOG" 2>&1
commit_stage "Record the crowded-tile budget probe (sampler resolution vs model)" \
  docs/results/m71/crowded_budget_probe.json

note "queue r5d done"
commit_stage "Close the r5d queue log"
