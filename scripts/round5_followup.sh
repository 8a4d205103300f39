#!/bin/bash
# Round-5 follow-up sequence: waits for the gen stages (round5_runs.sh
# gen5/gen5_hold/gen5_pose, tracked by /tmp/gen5.pid), then runs the
# flagship retrain and every measurement that needs its checkpoint:
#
#   final5       300-epoch retrain on the fixed-distribution corpus
#   prof5_*      train-step profiles with the comparison-VJP maxpool
#   pose5_*      CPU-vs-TPU pose-eval bisect (VERDICT round-4 item 3)
#   sensor5      cross-domain sensor-transfer probe
#   pretrain5 + abl5_*   scratch-vs-pretrained ablation pair (item 6)
#
# Every stage respects a hard deadline (default 20:30 UTC) so the tunnel is
# free for the driver's end-of-round bench. Stages log to
# outputs/round5_logs/<name>.log and append to driver.log; failures don't
# stop the sequence (round-4 lesson: the final retrain silently never ran).
set -u
cd "$(dirname "$0")/.."
LOG=outputs/round5_logs
mkdir -p "$LOG" outputs/profiles

DEADLINE=${DEADLINE:-$(date -d 20:30 +%s)}
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

# ---- 1. wait for the generation sequence to finish ----
if [ -f /tmp/gen5.pid ]; then
  while kill -0 "$(cat /tmp/gen5.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== [$(date +%H:%M:%S)] gen sequence done; starting final5" | tee -a "$LOG/driver.log"

# ---- 2. flagship retrain (VERDICT item 1) ----
DATA5="--job-dir outputs/scale_run5/jobs --data-root outputs/scale_run5/data"
EVAL5="--holdout-job-dir outputs/scale_run5/holdout_jobs --pose-eval-job outputs/scale_run5/pose_jobs/00000000"
OP5="--batch-size 256 --device-data-rows 9500 --device-data-refresh-epochs 32"
run final5 14400 python scripts/train_at_scale.py --epochs 300 $DATA5 $OP5 $EVAL5 \
  --output-dir outputs/models/scale_run5 --head spatial --ema-decay 0.9 \
  --oversample-outframe 1.0 --outframe-corner-weight 0.3

# ---- 3. train-step profiles with the new maxpool VJP (item 2 evidence) ----
run prof5_fwdbwd 1800 python scripts/profile_train_step.py --variant fwdbwd \
  --output-dir outputs/profiles/r5_fwdbwd
run prof5_full_bf16 1800 python scripts/profile_train_step.py --variant full \
  --input-dtype bfloat16 --output-dir outputs/profiles/r5_full_bf16

# ---- 4. CPU-vs-TPU pose-eval bisect (item 3) ----
POSE5="--job-dir outputs/scale_run5/pose_jobs/00000000 --model-path outputs/models/scale_run5/final"
run pose5_cpu 3600 python scripts/pose_backend_check.py --platform cpu $POSE5 \
  --out outputs/round5_logs/pose_cpu.npz
run pose5_tpu 3600 python scripts/pose_backend_check.py --platform default $POSE5 \
  --out outputs/round5_logs/pose_tpu.npz \
  --fixed-keypoints outputs/round5_logs/pose_cpu.npz
run pose5_cmp 900 python scripts/pose_backend_check.py \
  --compare outputs/round5_logs/pose_cpu.npz,outputs/round5_logs/pose_tpu.npz

# ---- 5. sensor-transfer probe on the holdout split (item 4) ----
HO=outputs/scale_run5/data/holdout/pruned/pruned.hdf5
[ -f "$HO" ] || HO=outputs/scale_run5/data/pruned/pruned.hdf5
run sensor5 3600 python scripts/eval_sensor_transfer.py \
  --checkpoint outputs/models/scale_run5/final --dataset-path "$HO" \
  --output outputs/models/scale_run5/sensor_transfer.json

# ---- 6. pretrained-backbone ablation pair (item 6) ----
run pretrain5 5400 python scripts/pretrain_backbone.py \
  --dataset-path outputs/scale_run5/data/pruned/pruned.hdf5 \
  --epochs 30 --output-dir outputs/models/pretrain_rot5
run abl_scratch 5400 python scripts/train_at_scale.py --epochs 100 $DATA5 $OP5 \
  --skip-prepare --output-dir outputs/models/abl5_scratch --head spatial --ema-decay 0.9
if [ -d outputs/models/pretrain_rot5/final ]; then
  run abl_init 5400 python scripts/train_at_scale.py --epochs 100 $DATA5 $OP5 \
    --skip-prepare --output-dir outputs/models/abl5_init --head spatial --ema-decay 0.9 \
    --init-backbone outputs/models/pretrain_rot5/final
else
  echo "=== abl_init skipped: no pretrain checkpoint" | tee -a "$LOG/driver.log"
fi
echo "=== [$(date +%H:%M:%S)] followup sequence complete" | tee -a "$LOG/driver.log"
