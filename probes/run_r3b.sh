#!/bin/bash
# Round-3b targeted probes: seed the roofline cache (container restart
# wiped ~/.cache) and time the scan-family planned-boundary query
# (scanb) — the one stage with no successful TPU measurement yet.
cd "$(dirname "$0")/.."
OUT=probes/RESULTS.txt
source probes/lib.sh 2>/dev/null || true
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
roofline_stage() {
  for try in 1 2 3 4 5 6; do
    echo "[$(date +%H:%M:%S)] roofline try $try" >> "$OUT"
    if timeout 300 python -u -c \
        "import bench; bench.roofline_child(2**25, 2, 64)" 2>&1 \
        | grep -v WARNING | tee -a "$OUT" | grep -q "ROOFLINE [0-9]"; then
      return 0
    fi
    sleep 60
  done
  echo "[$(date +%H:%M:%S)] roofline GAVE UP" >> "$OUT"
}
roofline_stage
run_stage probes/ell_probe.py scanb "scanb:" 1500
echo "[$(date +%H:%M:%S)] R3B DONE" >> "$OUT"
