#!/bin/bash
# Time the tall-layout light ELL kernel vs the flat one (ellk: 25.6 us).
cd "$(dirname "$0")/.."
OUT=probes/RESULTS.txt
for try in 1 2 3 4 5 6; do
  echo "[$(date +%H:%M:%S)] elltall try $try" >> "$OUT"
  if timeout 900 python -u probes/ell_probe.py elltall 2>&1 \
      | grep -v WARNING | tee -a "$OUT" | grep -q "elltall:"; then
    exit 0
  fi
  sleep 60
done
echo "[$(date +%H:%M:%S)] elltall GAVE UP" >> "$OUT"
