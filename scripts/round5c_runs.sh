#!/bin/bash
# Round-5c sequence — revised round5b ordering (round5b_runs.sh was stopped
# in its wait loop and replaced by this): the 450-epoch accuracy attempt is
# moved as early as possible and the tail is left free for train-step perf
# experiments. Stages:
#
#   weights5b    difficulty weights from the scale_run5 checkpoint
#   augbench     aug-slice op-by-op attribution (guides kernel work during
#                the final5b window)
#   gen_pose_multi  8 short trajectories for the pooled pose metric
#   final5b      450-epoch weighted retrain (scale_run5 stack + difficulty
#                weights + longer schedule), targeting raw val RMSE <= 12 px
#   posemulti5b/5   pooled pose eval on both checkpoints
#   posegate5    re-run the single-trajectory pose eval on scale_run5 with
#                the NEW smoother innovation gate (the committed 17.3 deg
#                number predates the gate; two whole-frame detector failures
#                dominate it) and fold the keys into its metrics.json
#
# Usage: bash scripts/round5c_runs.sh [stage...]   (WAIT_PID: gate on a PID)
set -u
cd "$(dirname "$0")/.."
LOG=outputs/round5_logs
mkdir -p "$LOG" outputs/profiles

DEADLINE=${DEADLINE:-$(date -d 20:10 +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }

run() {  # run NAME BUDGET CMD... — skip if the budget doesn't fit the deadline
  local name=$1 budget=$2; shift 2
  if [ "$(left)" -lt "$budget" ]; then
    echo "=== [$(date +%H:%M:%S)] $name SKIPPED (budget ${budget}s > $(left)s left)" | tee -a "$LOG/driver.log"
    return 1
  fi
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$LOG/driver.log"
  timeout "$budget" "$@" > "$LOG/$name.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$?" | tee -a "$LOG/driver.log"
}

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== [$(date +%H:%M:%S)] starting round5c" | tee -a "$LOG/driver.log"

stages=${*:-weights5b augbench gen_pose_multi final5b posemulti5b posemulti5 posegate5}
DATA5="--job-dir outputs/scale_run5/jobs --data-root outputs/scale_run5/data"
EVAL5="--holdout-job-dir outputs/scale_run5/holdout_jobs --pose-eval-job outputs/scale_run5/pose_jobs/00000000"
OP5="--batch-size 256 --device-data-rows 9500 --device-data-refresh-epochs 32"

for s in $stages; do case $s in
  weights5b)
    run weights5b 1800 python scripts/compute_difficulty_weights.py \
      --dataset-path outputs/scale_run5/data/pruned/pruned.hdf5 \
      --checkpoint outputs/models/scale_run5/final \
      --output outputs/models/scale_run5/difficulty_weights.npy
    ;;
  augbench)
    run augbench 1200 python scripts/bench_aug_kernel.py \
      --out outputs/profiles/r5_augbench.json
    ;;
  gen_pose_multi)
    run gen_pose_multi 1200 python scripts/generate_dataset.py \
      --job-dir outputs/scale_run5/pose_multi_jobs --n-videos 8 \
      --platform default --seed 101
    ;;
  final5b)
    W=outputs/models/scale_run5/difficulty_weights.npy
    WARG=""
    [ -f "$W" ] && WARG="--sample-weights-path $W"
    run final5b 8400 python scripts/train_at_scale.py --epochs 450 \
      $DATA5 $OP5 $EVAL5 --skip-prepare \
      --output-dir outputs/models/scale_run5b --head spatial --ema-decay 0.9 \
      --oversample-outframe 1.0 --outframe-corner-weight 0.3 $WARG
    ;;
  posemulti5b)
    [ -d outputs/models/scale_run5b/final ] && \
    run posemulti5b 2400 python scripts/eval_pose_multi.py \
      --job-root outputs/scale_run5/pose_multi_jobs \
      --model-path outputs/models/scale_run5b/final \
      --output outputs/models/scale_run5b/pose_multi.json \
      --update-metrics outputs/models/scale_run5b/metrics.json
    ;;
  posemulti5)
    run posemulti5 2400 python scripts/eval_pose_multi.py \
      --job-root outputs/scale_run5/pose_multi_jobs \
      --model-path outputs/models/scale_run5/final \
      --output outputs/models/scale_run5/pose_multi.json \
      --update-metrics outputs/models/scale_run5/metrics.json
    ;;
  posegate5)
    run posegate5 900 python -m perseus_tpu.eval.pose_eval \
      --job-dir outputs/scale_run5/pose_jobs/00000000 \
      --model-path outputs/models/scale_run5/final \
      --metrics-out outputs/models/scale_run5/metrics.json
    ;;
esac; done
echo "=== [$(date +%H:%M:%S)] round5c sequence complete" | tee -a "$LOG/driver.log"
