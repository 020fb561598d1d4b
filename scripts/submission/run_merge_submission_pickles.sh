#!/usr/bin/env bash
# Merge per-shard submission pickles into one
# (reference analogue: scripts/submission/run_merge_submission_pickles.sh).
set -euo pipefail
source "$(dirname "$0")/../common.sh"
: "${TRAIN_TEST_SPLIT:=navtest}"

python -m diffusiondrive_tpu.script.run_merge_submission_pickles \
    --output "$NAVSIM_EXP_ROOT/submission/merged_submission.pkl" \
    "$@"
