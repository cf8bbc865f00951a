#!/bin/bash
# Time the scan-family query after the bitselect mask-mode change.
cd "$(dirname "$0")/.."
OUT=probes/RESULTS.txt
for try in 1 2 3 4 5 6; do
  echo "[$(date +%H:%M:%S)] scanb try $try (bitselect mask)" >> "$OUT"
  if timeout 1500 python -u probes/ell_probe.py scanb 2>&1 \
      | grep -v WARNING | tee -a "$OUT" | grep -q "scanb:"; then
    exit 0
  fi
  sleep 60
done
echo "[$(date +%H:%M:%S)] scanb GAVE UP" >> "$OUT"
