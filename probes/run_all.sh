#!/bin/bash
# Resilient probe runner: the TPU tunnel has multi-minute death windows,
# so each stage runs in its own time-boxed subprocess and retries until
# it prints a result line. Results append to probes/RESULTS.txt.
cd "$(dirname "$0")/.."
OUT=probes/RESULTS.txt
run_stage() {
  local script=$1 variant=$2 needle=$3 budget=${4:-420}
  for try in 1 2 3 4 5 6; do
    echo "[$(date +%H:%M:%S)] $script $variant try $try" >> "$OUT"
    if timeout "$budget" python -u "$script" "$variant" 2>&1 \
        | grep -v WARNING | tee -a "$OUT" | grep -q "$needle"; then
      return 0
    fi
    sleep 60
  done
  echo "[$(date +%H:%M:%S)] $script $variant GAVE UP" >> "$OUT"
}
run_stage probes/ell_probe.py ell "ell:"
run_stage probes/ell_probe.py scatter "k2=32768"
run_stage probes/crossmat_floor.py vd "vd:"
run_stage probes/crossmat_floor.py raw "raw:"
echo "[$(date +%H:%M:%S)] ALL DONE" >> "$OUT"
