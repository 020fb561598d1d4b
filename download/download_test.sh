#!/usr/bin/env bash
# Convenience wrapper (reference analogue: download/download_test.sh).
exec "$(dirname "$0")/download_openscene.sh" test "$@"
