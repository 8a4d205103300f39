#!/bin/bash
# Follow-up to a running round4_runs.sh instance: waits for it to exit
# (PID file argument), then runs the stages that depend on its outputs —
# the fixed-memory rotation pretrain, the pretrained-init ablation
# (completing the scratch-vs-init pair against abl_spatial), and the
# sensor-domain transfer probe on the freshly trained flagship checkpoint.
#
# Usage: bash scripts/round4_followup.sh /tmp/r4seq.pid
set -u
cd "$(dirname "$0")/.."
PIDFILE=${1:-/tmp/r4seq.pid}
LOG=outputs/round4_logs
mkdir -p "$LOG"

if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do sleep 60; done
fi
echo "=== [$(date +%H:%M:%S)] followup: primary sequence done" | tee -a "$LOG/driver.log"

bash scripts/round4_runs.sh pretrain abl_pre

run() {
  local name=$1; shift
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$LOG/driver.log"
  timeout 3600 "$@" > "$LOG/$name.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$?" | tee -a "$LOG/driver.log"
}

HO=outputs/scale_run3/data_full/holdout/pruned/pruned.hdf5
[ -f "$HO" ] || HO=outputs/scale_run3/data_full/pruned/pruned.hdf5
run sensor_transfer python scripts/eval_sensor_transfer.py \
  --checkpoint outputs/models/scale_run/final --dataset-path "$HO" \
  --output outputs/models/scale_run/sensor_transfer.json
