#!/bin/bash
# Round-3 follow-up TPU queue: cells (relocation-sweeps re-run), MH-vs-MALA
# kernel comparison (fused MALA timing), and the pooled D&C replicate study.
# Run after queue_r3.sh:  bash experiments/queue_r3b.sh [stage...]
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
LOG=/tmp
run() {
  local name="$1"; shift
  echo "=== stage $name: $* ==="
  ( "$@" ) >"$LOG/q_r3b_$name.log" 2>&1
  local rc=$?
  echo "=== stage $name done rc=$rc ==="
  tail -2 "$LOG/q_r3b_$name.log"
  return 0
}

STAGES=${*:-"cells_gen cells_smc cells_analyze kernels dnc_pooled"}

for s in $STAGES; do
  case "$s" in
    cells_gen)
      run cells_gen bash -c "cd '$REPO/experiments/cells' && python generate_images.py" ;;
    cells_smc)
      run cells_smc bash -c "cd '$REPO/experiments/cells' && rm -f output/cells/smc_batch*.npz && python run_smc.py" ;;
    cells_analyze)
      run cells_analyze bash -c "cd '$REPO/experiments/cells' && python ../analyze.py output/cells" ;;
    kernels)
      run kernels bash -c "cd '$REPO/experiments/basic' && python generate_images.py --num-images 100 && python compare_kernels.py --num-images 100" ;;
    dnc_pooled)
      run dnc_pooled bash -c "cd '$REPO/experiments/divideandconquer' && python compare_pooled.py --num-images 30 --reps 8" ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "queue b complete"
