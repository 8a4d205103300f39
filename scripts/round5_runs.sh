#!/bin/bash
# Round-5 sequence (single v5e through the axon tunnel; run ONE tunnel-bound
# job at a time). Regenerates the flagship corpus on the FIXED datagen
# distribution (support-radius contacts + spawn->landing corridor clearance
# + texture-family backgrounds) and retrains the flagship at the reference
# operating point (2,500 videos, 300 epochs) — VERDICT round-4 item 1.
#
# Stages:
#   gen5        2,500 train-style videos  -> outputs/scale_run5/jobs
#   gen5_hold     400 holdout-style videos-> outputs/scale_run5/holdout_jobs
#   gen5_pose       1 pose-eval video     -> outputs/scale_run5/pose_jobs
#   final5      300-epoch flagship retrain -> outputs/models/scale_run5
#   pretrain5   rotation-pretext backbone pretrain on the new split
#   abl_scratch / abl_init   scratch-vs-pretrained 100-epoch pair (item 6)
#   sensor5     cross-domain sensor-transfer probe on the new checkpoint
#
# Usage: bash scripts/round5_runs.sh [stage...]   (default: gen+final)
set -u
cd "$(dirname "$0")/.."
LOG=outputs/round5_logs
mkdir -p "$LOG"

run() {  # run NAME BUDGET CMD... — log, tolerate failure, continue
  local name=$1 budget=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$LOG/driver.log"
  timeout "$budget" "$@" > "$LOG/$name.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$?" | tee -a "$LOG/driver.log"
}

DATA5="--job-dir outputs/scale_run5/jobs --data-root outputs/scale_run5/data"
EVAL5="--holdout-job-dir outputs/scale_run5/holdout_jobs --pose-eval-job outputs/scale_run5/pose_jobs/00000000"
# no --host-cache and 32-epoch refresh windows: the remote-transfer client
# retains ~26% of uploaded bytes in host RSS per refresh (round-4 OOM
# postmortem); keep peak RSS < 60 GB
OP5="--batch-size 256 --device-data-rows 9500 --device-data-refresh-epochs 32"

stages=${*:-gen5 gen5_hold gen5_pose final5}
for s in $stages; do case $s in
  gen5)
    run gen5 21600 python scripts/generate_dataset.py \
      --job-dir outputs/scale_run5/jobs --n-videos 2500 --platform default --seed 51
    ;;
  gen5_hold)
    run gen5_hold 7200 python scripts/generate_dataset.py \
      --job-dir outputs/scale_run5/holdout_jobs --n-videos 400 --style holdout \
      --platform default --seed 95
    ;;
  gen5_pose)
    run gen5_pose 600 python scripts/generate_dataset.py \
      --job-dir outputs/scale_run5/pose_jobs --n-videos 1 --platform default --seed 78
    ;;
  final5)
    # the round-4 lever stack minus the 32 px target clamp (the clamp put a
    # measured 26.8 px structural floor under raw RMSE on a high-OOF split;
    # the fixed distribution's OOF rate is ~0.05 so extrapolation is cheap
    # and honest): spatial head, EMA 0.9, out-frame oversample + downweight
    run final5 14400 python scripts/train_at_scale.py --epochs 300 $DATA5 $OP5 $EVAL5 \
      --output-dir outputs/models/scale_run5 --head spatial --ema-decay 0.9 \
      --oversample-outframe 1.0 --outframe-corner-weight 0.3
    ;;
  pretrain5)
    run pretrain5 7200 python scripts/pretrain_backbone.py \
      --dataset-path outputs/scale_run5/data/pruned/pruned.hdf5 \
      --epochs 30 --output-dir outputs/models/pretrain_rot5
    ;;
  abl_scratch)
    run abl_scratch 7200 python scripts/train_at_scale.py --epochs 100 $DATA5 $OP5 \
      --skip-prepare --output-dir outputs/models/abl5_scratch --head spatial --ema-decay 0.9
    ;;
  abl_init)
    if [ -d outputs/models/pretrain_rot5/final ]; then
      run abl_init 7200 python scripts/train_at_scale.py --epochs 100 $DATA5 $OP5 \
        --skip-prepare --output-dir outputs/models/abl5_init --head spatial --ema-decay 0.9 \
        --init-backbone outputs/models/pretrain_rot5/final
    else
      echo "=== abl_init skipped: no pretrain checkpoint" | tee -a "$LOG/driver.log"
    fi
    ;;
  sensor5)
    HO=outputs/scale_run5/data/holdout/pruned/pruned.hdf5
    [ -f "$HO" ] || HO=outputs/scale_run5/data/pruned/pruned.hdf5
    run sensor5 3600 python scripts/eval_sensor_transfer.py \
      --checkpoint outputs/models/scale_run5/final --dataset-path "$HO" \
      --output outputs/models/scale_run5/sensor_transfer.json
    ;;
  *) echo "unknown stage $s";;
esac; done
