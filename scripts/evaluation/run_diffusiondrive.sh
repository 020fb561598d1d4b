#!/usr/bin/env bash
# PDMS evaluation of diffusiondrive_agent (reference analogue: scripts/evaluation/run_diffusiondrive.sh).
set -euo pipefail
source "$(dirname "$0")/../common.sh"
: "${TRAIN_TEST_SPLIT:=navtest}"

python -m diffusiondrive_tpu.script.run_pdm_score \
    --agent diffusiondrive_agent \
    --split "$TRAIN_TEST_SPLIT" \
    --navsim-log-path "$OPENSCENE_DATA_ROOT/navsim_logs/test" \
    --sensor-blobs-path "$OPENSCENE_DATA_ROOT/sensor_blobs/test" \
    --metric-cache-path "$NAVSIM_EXP_ROOT/metric_cache" \
    --output-dir "$NAVSIM_EXP_ROOT/diffusiondrive_agent_eval" \
    "$@"
