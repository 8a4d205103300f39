#!/bin/bash
# Round-5b sequence: accuracy attempt #2 + perf evidence, queued behind the
# round5_followup.sh stages (single TPU through the tunnel — one job at a
# time). Stages:
#
#   prof5b_fwdbwd   re-profile the train step after the maxpool-VJP revert
#                   (expect ~41 ms/step back from the 49.7 ms regression)
#   augbench        scripts/bench_aug_kernel.py — attribute the augmentation
#                   slice op by op before touching the kernels
#   gen_pose_multi  8 short trajectories for the pooled pose metric
#   weights5b       difficulty weights from the scale_run5 checkpoint on the
#                   CURRENT split (round-4 recipe; was chicken-and-egg until
#                   a new-split checkpoint existed)
#   final5b         450-epoch retrain = scale_run5 stack + difficulty
#                   weights + longer schedule (val loss was still falling at
#                   epoch 300), targeting raw val RMSE <= 12 px
#   posemulti5b/5   pooled pose eval on both checkpoints; folds pose_multi_*
#                   keys into each run's metrics.json
#
# Usage: bash scripts/round5b_runs.sh [stage...]
set -u
cd "$(dirname "$0")/.."
LOG=outputs/round5_logs
mkdir -p "$LOG" outputs/profiles

DEADLINE=${DEADLINE:-$(date -d 20:15 +%s)}
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

# ---- 0. wait for the round5_followup sequence to release the tunnel ----
# WAIT_PID = the followup shell's PID (pattern matching is unsafe here:
# unrelated command lines can match and wedge the wait).
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

echo "=== [$(date +%H:%M:%S)] followup done; starting round5b" | tee -a "$LOG/driver.log"

stages=${*:-prof5b_fwdbwd augbench gen_pose_multi weights5b final5b posemulti5b posemulti5}
DATA5="--job-dir outputs/scale_run5/jobs --data-root outputs/scale_run5/data"
EVAL5="--holdout-job-dir outputs/scale_run5/holdout_jobs --pose-eval-job outputs/scale_run5/pose_jobs/00000000"
OP5="--batch-size 256 --device-data-rows 9500 --device-data-refresh-epochs 32"

for s in $stages; do case $s in
  prof5b_fwdbwd)
    run prof5b_fwdbwd 1800 python scripts/profile_train_step.py --variant fwdbwd \
      --output-dir outputs/profiles/r5_fwdbwd_rev
    ;;
  augbench)
    run augbench 1800 python scripts/bench_aug_kernel.py \
      --out outputs/profiles/r5_augbench.json
    ;;
  gen_pose_multi)
    run gen_pose_multi 1200 python scripts/generate_dataset.py \
      --job-dir outputs/scale_run5/pose_multi_jobs --n-videos 8 \
      --platform default --seed 101
    ;;
  weights5b)
    run weights5b 1800 python scripts/compute_difficulty_weights.py \
      --dataset-path outputs/scale_run5/data/pruned/pruned.hdf5 \
      --checkpoint outputs/models/scale_run5/final \
      --output outputs/models/scale_run5/difficulty_weights.npy
    ;;
  final5b)
    W=outputs/models/scale_run5/difficulty_weights.npy
    WARG=""
    [ -f "$W" ] && WARG="--sample-weights-path $W"
    run final5b 9000 python scripts/train_at_scale.py --epochs 450 \
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
esac; done
echo "=== [$(date +%H:%M:%S)] round5b sequence complete" | tee -a "$LOG/driver.log"
