#!/usr/bin/env bash
# PDMS evaluation of constant_velocity_agent (reference analogue: scripts/evaluation/run_cv_pdm_score_evaluation.sh).
set -euo pipefail
source "$(dirname "$0")/../common.sh"
: "${TRAIN_TEST_SPLIT:=navtest}"

python -m diffusiondrive_tpu.script.run_pdm_score \
    --agent constant_velocity_agent \
    --split "$TRAIN_TEST_SPLIT" \
    --navsim-log-path "$OPENSCENE_DATA_ROOT/navsim_logs/test" \
    --sensor-blobs-path "$OPENSCENE_DATA_ROOT/sensor_blobs/test" \
    --metric-cache-path "$NAVSIM_EXP_ROOT/metric_cache" \
    --output-dir "$NAVSIM_EXP_ROOT/constant_velocity_agent_eval" \
    "$@"
