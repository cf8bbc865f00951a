#!/bin/bash
# Validate + time the rotated crossmat output blocks on TPU.
cd "$(dirname "$0")/.."
OUT=probes/RESULTS.txt
run_stage() {
  local variant=$1 needle=$2 budget=$3
  for try in 1 2 3 4 5 6; do
    echo "[$(date +%H:%M:%S)] $variant try $try (rotated out)" >> "$OUT"
    if timeout "$budget" python -u probes/ell_probe.py "$variant" 2>&1 \
        | grep -v WARNING | tee -a "$OUT" | grep -q "$needle"; then
      return 0
    fi
    sleep 60
  done
  echo "[$(date +%H:%M:%S)] $variant GAVE UP" >> "$OUT"
}
run_stage ell "ell:" 900
run_stage ellok "ellok:" 1500
run_stage crossd "crossd:" 900
echo "[$(date +%H:%M:%S)] ROT DONE" >> "$OUT"
