#!/bin/bash
# Round-5d tail: on-chip wall-clock measurement of the scoped-VMEM compile
# option (utils/xla_opts.py) once the accuracy/pose stages release the chip.
# Each profile is ~3 min; the sweep stops early if the first option loses.
#
# The baseline is RE-MEASURED first in the same window: fwdbwd wall numbers
# drift ~1-2 ms between sessions (tunnel/host variance: 43.7 session 1,
# 42.1 session 2), so comparing a fresh option run against a stored
# baseline would bury a small win or fake one.
#
# Usage: WAIT_PID=<accuracy-stage shell pid> bash scripts/round5d_perf.sh
set -u
cd "$(dirname "$0")/.."
LOG=outputs/round5_logs
mkdir -p "$LOG" outputs/profiles

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== [$(date +%H:%M:%S)] starting round5d perf sweep" | tee -a "$LOG/driver.log"

ms() { python -c "import json,sys;print(json.load(open(sys.argv[1]))['ms_per_step'])" "$1" 2>/dev/null || echo 99999; }

timeout 1200 python scripts/profile_train_step.py --variant fwdbwd \
  --output-dir outputs/profiles/r5_fwdbwd_base3 > "$LOG/prof_base3.log" 2>&1
BASE=$(ms outputs/profiles/r5_fwdbwd_base3/summary_fwdbwd.json)
echo "=== [$(date +%H:%M:%S)] fresh baseline fwdbwd: $BASE ms" | tee -a "$LOG/driver.log"

PERSEUS_COMPILER_OPTIONS=xla_tpu_scoped_vmem_limit_kib=65536 \
  timeout 1200 python scripts/profile_train_step.py --variant fwdbwd \
  --output-dir outputs/profiles/r5_fwdbwd_vmem64 > "$LOG/prof_vmem64.log" 2>&1
V64=$(ms outputs/profiles/r5_fwdbwd_vmem64/summary_fwdbwd.json)
echo "=== [$(date +%H:%M:%S)] vmem64 fwdbwd: $V64 ms (baseline $BASE)" | tee -a "$LOG/driver.log"

if python -c "import sys; sys.exit(0 if float('$V64') < float('$BASE') - 0.5 else 1)"; then
  PERSEUS_COMPILER_OPTIONS=xla_tpu_scoped_vmem_limit_kib=98304 \
    timeout 1200 python scripts/profile_train_step.py --variant fwdbwd \
    --output-dir outputs/profiles/r5_fwdbwd_vmem96 > "$LOG/prof_vmem96.log" 2>&1
  V96=$(ms outputs/profiles/r5_fwdbwd_vmem96/summary_fwdbwd.json)
  echo "=== [$(date +%H:%M:%S)] vmem96 fwdbwd: $V96 ms" | tee -a "$LOG/driver.log"
else
  echo "=== vmem64 not a win; skipping vmem96" | tee -a "$LOG/driver.log"
fi
echo "=== [$(date +%H:%M:%S)] round5d sweep complete" | tee -a "$LOG/driver.log"
