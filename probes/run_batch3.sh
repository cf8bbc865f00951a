#!/bin/bash
# Round-3 third batch: scanb re-probe after the Mosaic block-shape fix,
# and the on-device exactness check (ellok) with a budget that covers
# the ~34 MB step-array uploads.
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
run_stage probes/ell_probe.py ell "ell:" 600 4
run_stage probes/ell_probe.py scanb "scanb:" 1500 3
run_stage probes/ell_probe.py ellok "ellok:" 1500 2
echo "[$(date +%H:%M:%S)] BATCH3 DONE" >> "$OUT"
