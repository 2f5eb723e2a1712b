#!/bin/bash
# Round-3 experiment queue: one TPU job at a time (single chip).
# Run from anywhere:  bash experiments/queue_r3.sh [stage...]
# Stages default to the full M71 list; each writes its log to /tmp/q_r3_*.
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
LOG=/tmp
run() {
  local name="$1"; shift
  echo "=== stage $name: $* ==="
  ( "$@" ) >"$LOG/q_r3_$name.log" 2>&1
  local rc=$?
  echo "=== stage $name done rc=$rc ==="
  tail -2 "$LOG/q_r3_$name.log"
  if [ $rc -ne 0 ]; then
    # a failed prerequisite must not let later stages run against stale
    # or missing artifacts
    echo "=== stage $name FAILED (rc=$rc); aborting queue ===" >&2
    exit $rc
  fi
  return $rc
}

STAGES=${*:-"m71_smc m71_sep m71_mcmc m71_analyze m71_analyze_mcmc semi_gen semi_smc semi_sep semi_analyze"}

for s in $STAGES; do
  case "$s" in
    m71_smc)
      run m71_smc bash -c "cd '$REPO/experiments/m71' && python run_smc.py" ;;
    m71_sep)
      run m71_sep bash -c "cd '$REPO/experiments/m71' && python run_sep.py" ;;
    m71_mcmc)
      run m71_mcmc bash -c "cd '$REPO/experiments/m71' && python run_mcmc.py --num-images 100" ;;
    m71_analyze)
      run m71_analyze bash -c "cd '$REPO/experiments/m71' && mkdir -p output/m71 && cp data/m71/tiles.npz output/m71/tiles.npz && python ../analyze.py output/m71" ;;
    m71_analyze_mcmc)
      run m71_analyze_mcmc bash -c "cd '$REPO/experiments/m71' && python ../analyze.py output/m71 --method mcmc" ;;
    semi_gen)
      # round-2 artifacts are stale (scalar background, max_objects 6):
      # clear them or the runner's resume would skip every batch
      run semi_gen bash -c "cd '$REPO/experiments/m71semisynthetic' && rm -f output/m71semisynthetic/smc_batch*.npz output/m71semisynthetic/mcmc_batch*.npz output/m71semisynthetic/sep_results.npz && python generate_images.py" ;;
    semi_smc)
      run semi_smc bash -c "cd '$REPO/experiments/m71semisynthetic' && python run_smc.py" ;;
    semi_sep)
      run semi_sep bash -c "cd '$REPO/experiments/m71semisynthetic' && python run_sep.py" ;;
    semi_analyze)
      run semi_analyze bash -c "cd '$REPO/experiments/m71semisynthetic' && python ../analyze.py output/m71semisynthetic" ;;
    cells_gen)
      run cells_gen bash -c "cd '$REPO/experiments/cells' && python generate_images.py" ;;
    cells_smc)
      run cells_smc bash -c "cd '$REPO/experiments/cells' && python run_smc.py" ;;
    cells_analyze)
      run cells_analyze bash -c "cd '$REPO/experiments/cells' && python ../analyze.py output/cells" ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "queue complete"
