#!/usr/bin/env bash
# Convenience wrapper (reference analogue: download/download_private_test_e2e.sh).
exec "$(dirname "$0")/download_openscene.sh" private_test_e2e "$@"
