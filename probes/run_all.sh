#!/bin/bash
# Resilient probe runner: the TPU tunnel has multi-minute death windows,
# so each stage runs in its own time-boxed subprocess and retries until
# it prints a result line. Results append to probes/RESULTS.txt.
#
# Hard-won rules encoded here (see CLAUDE.md):
# * ONE expensive compile per process (ellb takes a Q argument; the
#   calibration sweep is one point per process).
# * `timeout -k`: a hung dispatch can ignore SIGTERM; without the KILL
#   fallback `timeout` waits forever.
# * stdbuf + line-buffered grep: block buffering otherwise hides every
#   result line until process exit.
cd "$(dirname "$0")/.."
OUT=probes/RESULTS.txt
run_stage() {
  local needle=$1 budget=$2; shift 2
  for try in 1 2 3 4 5 6; do
    echo "[$(date +%H:%M:%S)] $* try $try" >> "$OUT"
    if timeout -k 10 "$budget" stdbuf -oL -eL python -u "$@" 2>&1 \
        | grep --line-buffered -v WARNING | tee -a "$OUT" \
        | grep -q "$needle"; then
      return 0
    fi
    sleep 60
  done
  echo "[$(date +%H:%M:%S)] $* GAVE UP" >> "$OUT"
}
roofline_stage() {
  # Seed the per-device roofline cache that bench.py's vs_baseline
  # uses (48 h validity); one time-boxed try per loop pass.
  for try in 1 2 3 4 5 6; do
    echo "[$(date +%H:%M:%S)] roofline try $try" >> "$OUT"
    if timeout -k 10 300 python -u -c \
        "import bench; bench.roofline_child(2**25, 2, 64)" 2>&1 \
        | grep --line-buffered -v WARNING | tee -a "$OUT" \
        | grep -q "ROOFLINE [0-9]"; then
      return 0
    fi
    sleep 60
  done
  echo "[$(date +%H:%M:%S)] roofline GAVE UP" >> "$OUT"
}
# Budgets must cover UPLOADS: device_put is lazy and the first kernel
# call pays the transfer through the tunnel (the scan stages upload
# ~34 MB; ELL stages ~3 MB).
roofline_stage
run_stage "ellk:" 600 probes/ell_probe.py ellk        # tall tier kernel
run_stage "heavyk:" 600 probes/ell_probe.py heavyk    # heavy nibble pass
run_stage "ell:" 900 probes/ell_probe.py ell          # full split query
run_stage "ellok:" 1500 probes/ell_probe.py ellok     # on-device exactness
run_stage "ellraw:" 900 probes/ell_probe.py ellraw    # kernel w/o XLA glue
run_stage "ellb q=8" 900 probes/ell_probe.py ellb 8   # batched, one Q each
run_stage "ellb q=16" 900 probes/ell_probe.py ellb 16
run_stage "ellb q=32" 900 probes/ell_probe.py ellb 32
run_stage "ellbok:" 1500 probes/ell_probe.py ellbok   # batched exactness
run_stage "ellb3 q=16" 900 probes/ell_probe.py ellb3 16  # 3-tier split emission
run_stage "ellb3ok:" 1500 probes/ell_probe.py ellb3ok
run_stage "crossd:" 900 probes/ell_probe.py crossd    # dense depth-only
run_stage "scanb:" 1500 probes/ell_probe.py scanb     # scan + planned bnd
run_stage "scanx:" 1500 probes/ell_probe.py scanx     # scan + XLA bnd
run_stage "scatter: done" 600 probes/ell_probe.py scatter
run_stage "chop:" 900 probes/transform_probe.py chop  # host-vs-device
run_stage "crush:" 900 probes/transform_probe.py crush
echo "[$(date +%H:%M:%S)] ALL DONE" >> "$OUT"
