#!/usr/bin/env bash
# Build a {token -> Trajectory} submission pickle with the CV baseline
# (reference analogue: scripts/submission/run_cv_create_submission_pickle.sh).
set -euo pipefail
source "$(dirname "$0")/../common.sh"
: "${TRAIN_TEST_SPLIT:=navtest}"

python -m diffusiondrive_tpu.script.run_create_submission_pickle \
    --agent constant_velocity_agent \
    --split "$TRAIN_TEST_SPLIT" \
    --navsim-log-path "$OPENSCENE_DATA_ROOT/navsim_logs/test" \
    --sensor-blobs-path "$OPENSCENE_DATA_ROOT/sensor_blobs/test" \
    --output-dir "$NAVSIM_EXP_ROOT/submission" \
    "$@"
