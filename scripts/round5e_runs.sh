#!/bin/bash
# Round-5e (session 2, post host-reimage): the reimage wiped every run
# product (corpus, checkpoints) and the replacement host has ONE CPU core,
# so the staged 2,500-video/450-epoch round5c tail is unrunnable. This
# sequence rebuilds the pipeline end-to-end at the scale that fits:
#
#   gen6            500 train-style videos  -> outputs/scale_run6/jobs
#   gen6_hold       60 holdout-style videos -> outputs/scale_run6/holdout_jobs
#   gen6_pose       1 pose-eval trajectory  -> outputs/scale_run6/pose_jobs
#   gen6_posemulti  8 pose trajectories     -> outputs/scale_run6/pose_multi_jobs
#   final6          150-epoch train with the scale_run5 lever stack
#                   (spatial head, EMA, out-of-frame oversampling)
#   posemulti6      pooled 8-trajectory pose metric -> scale_run6/metrics.json
#   posegate6       single-trajectory pose eval (innovation-gated smoother)
#
# Purpose: a LIVE checkpoint (bench loads real weights; the wiped flagship
# can't be reloaded), the pooled pose_multi_* metric on real hardware, and
# an end-to-end validation of the full offline pipeline on this host. The
# committed scale_run5 metrics (2,500 videos / 300 epochs, 14.65 px) remain
# the flagship accuracy record; this ~5x-smaller corpus is expected to land
# materially above it and is labeled scale_run6 so nothing is conflated.
#
# Usage: bash scripts/round5e_runs.sh [stage...]
set -u
cd "$(dirname "$0")/.."
LOG=outputs/round5_logs
mkdir -p "$LOG"

DEADLINE=${DEADLINE:-$(( $(date +%s) + 10500 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

run() {  # run NAME BUDGET CMD... — skip if the budget doesn't fit the deadline
  local name=$1 budget=$2; shift 2
  if [ "$(left)" -lt 120 ]; then
    echo "=== [$(date +%H:%M:%S)] $name SKIPPED ($(left)s left)" | tee -a "$LOG/driver5e.log"
    return 1
  fi
  [ "$budget" -gt "$(left)" ] && budget=$(left)
  echo "=== [$(date +%H:%M:%S)] $name (budget ${budget}s): $*" | tee -a "$LOG/driver5e.log"
  timeout "$budget" "$@" > "$LOG/$name.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$?" | tee -a "$LOG/driver5e.log"
}

stages=${*:-gen6 gen6_hold gen6_pose gen6_posemulti final6 posemulti6 posegate6}
DATA6="--job-dir outputs/scale_run6/jobs --data-root outputs/scale_run6/data"
EVAL6="--holdout-job-dir outputs/scale_run6/holdout_jobs --pose-eval-job outputs/scale_run6/pose_jobs/00000000"

for s in $stages; do case $s in
  gen6)
    run gen6 4500 python scripts/generate_dataset.py \
      --job-dir outputs/scale_run6/jobs --n-videos 500 --style train --seed 11
    ;;
  gen6_hold)
    run gen6_hold 900 python scripts/generate_dataset.py \
      --job-dir outputs/scale_run6/holdout_jobs --n-videos 60 --style holdout --seed 12
    ;;
  gen6_pose)
    run gen6_pose 300 python scripts/generate_dataset.py \
      --job-dir outputs/scale_run6/pose_jobs --n-videos 1 --seed 78
    ;;
  gen6_posemulti)
    run gen6_posemulti 420 python scripts/generate_dataset.py \
      --job-dir outputs/scale_run6/pose_multi_jobs --n-videos 8 --seed 101
    ;;
  final6)
    run final6 4800 python scripts/train_at_scale.py --epochs 150 \
      $DATA6 $EVAL6 --batch-size 256 \
      --output-dir outputs/models/scale_run6 --head spatial --ema-decay 0.9 \
      --oversample-outframe 1.0 --outframe-corner-weight 0.3
    ;;
  posemulti6)
    [ -d outputs/models/scale_run6/final ] && \
    run posemulti6 1800 python scripts/eval_pose_multi.py \
      --job-root outputs/scale_run6/pose_multi_jobs \
      --model-path outputs/models/scale_run6/final \
      --output outputs/models/scale_run6/pose_multi.json \
      --update-metrics outputs/models/scale_run6/metrics.json
    ;;
  posegate6)
    [ -d outputs/models/scale_run6/final ] && \
    run posegate6 900 python -m perseus_tpu.eval.pose_eval \
      --job-dir outputs/scale_run6/pose_jobs/00000000 \
      --model-path outputs/models/scale_run6/final \
      --metrics-out outputs/models/scale_run6/metrics.json
    ;;
esac; done
echo "=== [$(date +%H:%M:%S)] round5e sequence complete" | tee -a "$LOG/driver5e.log"
