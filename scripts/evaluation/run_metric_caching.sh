#!/usr/bin/env bash
# Metric caching: PDM-Closed rollout + GT interpolation per scene
# (reference analogue: scripts/evaluation/run_metric_caching.sh).
set -euo pipefail
source "$(dirname "$0")/../common.sh"
: "${TRAIN_TEST_SPLIT:=navtest}"

python -m diffusiondrive_tpu.script.run_metric_caching \
    --split "$TRAIN_TEST_SPLIT" \
    --navsim-log-path "$OPENSCENE_DATA_ROOT/navsim_logs/test" \
    --metric-cache-path "$NAVSIM_EXP_ROOT/metric_cache" \
    "$@"
