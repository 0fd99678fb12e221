#!/bin/bash
# Serial TPU work queue for a measurement round. ONE job owns the chip at a
# time (concurrent processes multiplex through the tunnel and pollute each
# other's timings). Each step is independently resumable; rerun with a step
# list to redo a subset, e.g.:  bash scripts/chip_queue.sh refresh probe
set -u
cd "$(dirname "$0")/.."
STEPS="${*:-refresh probe train_srresnet neural_rows quality}"

run() { echo "=== [$(date +%H:%M:%S)] $* ==="; "$@"; echo "=== rc=$? ==="; }

for step in $STEPS; do
  case "$step" in
    refresh)
      run python scripts/refresh_results.py ;;
    probe)
      run python scripts/adaptive_probe_lab.py ;;
    train_srresnet)
      run python scripts/train_models.py --only srresnet_tpu ;;
    neural_rows)
      # re-publish the neural + learned rows after (re)training
      run python scripts/refresh_results.py --only method_throughput ;;
    quality)
      run python scripts/quality_table.py ;;
    *)
      echo "unknown step: $step" ;;
  esac
done
