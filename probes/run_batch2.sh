#!/bin/bash
# Round-3 second probe batch: split-ELL after the wide-tile padding
# fix, and the scan family with/without the planned boundary gather.
# The scan probes upload ~34 MB of step arrays through the tunnel, so
# their budgets are generous.
cd "$(dirname "$0")/.."
OUT=probes/RESULTS.txt
run_stage() {
  local script=$1 variant=$2 needle=$3 budget=${4:-420} tries=${5:-6}
  for try in $(seq 1 "$tries"); do
    echo "[$(date +%H:%M:%S)] $script $variant try $try" >> "$OUT"
    if timeout "$budget" python -u "$script" "$variant" 2>&1 \
        | grep -v WARNING | tee -a "$OUT" | grep -q "$needle"; then
      return 0
    fi
    sleep 60
  done
  echo "[$(date +%H:%M:%S)] $script $variant GAVE UP" >> "$OUT"
}
run_stage probes/ell_probe.py ell "ell:" 600 5
run_stage probes/ell_probe.py ellok "ellok:" 600 4
run_stage probes/ell_probe.py scanb "scanb:" 1500 3
run_stage probes/ell_probe.py scanx "scanx:" 1500 3
echo "[$(date +%H:%M:%S)] BATCH2 DONE" >> "$OUT"
