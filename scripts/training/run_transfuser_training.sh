#!/usr/bin/env bash
# Training of transfuser_agent (reference analogue: scripts/training/run_transfuser_training.sh).
set -euo pipefail
source "$(dirname "$0")/../common.sh"
: "${TRAIN_TEST_SPLIT:=navtrain}"

python -m diffusiondrive_tpu.script.run_training \
    --agent transfuser_agent \
    --split "$TRAIN_TEST_SPLIT" \
    --navsim-log-path "$OPENSCENE_DATA_ROOT/navsim_logs/trainval" \
    --sensor-blobs-path "$OPENSCENE_DATA_ROOT/sensor_blobs/trainval" \
    --cache-path "$NAVSIM_EXP_ROOT/training_cache" \
    --output-dir "$NAVSIM_EXP_ROOT/training_transfuser_agent" \
    "$@"
