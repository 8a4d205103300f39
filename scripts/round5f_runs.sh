#!/bin/bash
# Round-5f (session 3): the ≤12 px raw-RMSE attempt that fits this host.
# Session 2's rebuild (round5e) trained scale_run6 on a 500-video corpus;
# this sequence grows the SAME corpus to 1,500 videos (gen7, already
# running when this script starts) and continues training from the
# scale_run6 checkpoint — a full warm start (init_backbone + init_head,
# fresh AdamW/LR) at 5e-4, the LR a continuous plateau schedule would
# have reached by this depth. Labeled scale_run7; the committed
# scale_run5 metrics (2,500 videos / 300 epochs from scratch, 14.65 px)
# remain the reference record and bench.py picks whichever run scores
# lowest raw val RMSE.
#
# Stages (run serially; prep7 is CPU-pinned and may overlap a TPU job):
#   prep7       label/merge/prune the 1,500-video corpus + holdout split
#   final7      300-epoch warm-started retrain -> outputs/models/scale_run7
#   posemulti7  pooled 8-trajectory pose metric into scale_run7/metrics.json
#
# Usage: bash scripts/round5f_runs.sh [stage...]   (WAIT_PID: gate on a PID)
set -u
cd "$(dirname "$0")/.."
LOG=outputs/round5_logs
mkdir -p "$LOG"

DEADLINE=${DEADLINE:-$(( $(date +%s) + 11400 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

run() {  # run NAME BUDGET CMD... — cap the budget at the deadline
  local name=$1 budget=$2; shift 2
  if [ "$(left)" -lt 120 ]; then
    echo "=== [$(date +%H:%M:%S)] $name SKIPPED ($(left)s left)" | tee -a "$LOG/driver5f.log"
    return 1
  fi
  [ "$budget" -gt "$(left)" ] && budget=$(left)
  echo "=== [$(date +%H:%M:%S)] $name (budget ${budget}s): $*" | tee -a "$LOG/driver5f.log"
  timeout "$budget" "$@" > "$LOG/$name.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$?" | tee -a "$LOG/driver5f.log"
}

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

stages=${*:-prep7 final7 posemulti7}
DATA7="--job-dir outputs/scale_run6/jobs --data-root outputs/scale_run7/data"
EVAL7="--holdout-job-dir outputs/scale_run6/holdout_jobs --pose-eval-job outputs/scale_run6/pose_jobs/00000000"
OP7="--batch-size 256 --device-data-rows 9500 --device-data-refresh-epochs 32"

for s in $stages; do case $s in
  prep7)
    run prep7 3600 python scripts/prepare_at_scale.py $DATA7 \
      --holdout-job-dir outputs/scale_run6/holdout_jobs
    ;;
  final7)
    # wait for the TPU to free up (the round5e pose evals)
    if [ -n "${TPU_WAIT_PID:-}" ]; then
      while kill -0 "$TPU_WAIT_PID" 2>/dev/null; do sleep 20; done
    fi
    # expected cost ~12s/epoch-equivalent all-in (train wall + refreshes +
    # evals + compile); pick the deepest schedule that fits the deadline —
    # the staged round-5c hypothesis was that a longer schedule breaks the
    # 12 px bar (scale_run5's val loss was still falling at epoch 300)
    EP=400
    [ "$(left)" -lt 6600 ] && EP=300
    [ "$(left)" -lt 5400 ] && EP=200
    [ "$(left)" -lt 4000 ] && EP=120
    run final7 7200 python scripts/train_at_scale.py --epochs $EP \
      $DATA7 $EVAL7 $OP7 --skip-prepare \
      --learning-rate 5e-4 \
      --init-backbone outputs/models/scale_run6/final --init-head true \
      --output-dir outputs/models/scale_run7 --head spatial --ema-decay 0.9 \
      --oversample-outframe 1.0 --outframe-corner-weight 0.3
    ;;
  posemulti7)
    [ -d outputs/models/scale_run7/final ] && \
    run posemulti7 1500 python scripts/eval_pose_multi.py \
      --job-root outputs/scale_run6/pose_multi_jobs \
      --model-path outputs/models/scale_run7/final \
      --output outputs/models/scale_run7/pose_multi.json \
      --update-metrics outputs/models/scale_run7/metrics.json
    ;;
esac; done
echo "=== [$(date +%H:%M:%S)] round5f sequence complete" | tee -a "$LOG/driver5f.log"
