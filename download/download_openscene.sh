#!/usr/bin/env bash
# Fetch OpenScene-v1.1 metadata + sensor blobs for one split and arrange them
# into the layout the framework's SceneLoader expects:
#   $OPENSCENE_DATA_ROOT/navsim_logs/<split>     (log pickles)
#   $OPENSCENE_DATA_ROOT/sensor_blobs/<split>    (jpeg / pcd blobs)
# Reference analogues: download/download_{mini,test,private_test_e2e}.sh.
#
# Usage: download_openscene.sh <mini|test|private_test_e2e> [--meta-only]
set -euo pipefail

SPLIT="${1:?usage: download_openscene.sh <mini|test|private_test_e2e> [--meta-only]}"
META_ONLY="${2:-}"
ROOT="${OPENSCENE_DATA_ROOT:-$PWD}"
HF_BASE="https://huggingface.co/datasets/OpenDriveLab/OpenScene/resolve/main/openscene-v1.1"
WORK="$ROOT/.openscene_download"
mkdir -p "$WORK" "$ROOT/navsim_logs" "$ROOT/sensor_blobs"
cd "$WORK"

fetch() { # url -> extracts into $WORK, deletes archive
    local url="$1" f; f="$(basename "$url")"
    wget -c -q --show-progress "$url"
    tar -xzf "$f"
    rm -f "$f"
}

echo "== metadata ($SPLIT)"
fetch "$HF_BASE/openscene_metadata_${SPLIT}.tgz"

if [[ "$META_ONLY" != "--meta-only" && "$SPLIT" != "private_test_e2e" ]]; then
    for kind in camera lidar; do
        for i in $(seq 0 31); do
            echo "== sensor ${kind} shard ${i}/31 ($SPLIT)"
            fetch "$HF_BASE/openscene_sensor_${SPLIT}_${kind}/openscene_sensor_${SPLIT}_${kind}_${i}.tgz"
        done
    done
elif [[ "$SPLIT" == "private_test_e2e" && "$META_ONLY" != "--meta-only" ]]; then
    fetch "$HF_BASE/openscene_sensor_private_test_e2e.tgz"
fi

# The archives unpack to slightly different tops per split; normalize.
move_into() { # src dst
    [[ -d "$1" ]] || return 0
    mkdir -p "$(dirname "$2")"
    rsync -a "$1"/ "$2"/
    rm -rf "$1"
}
for top in openscene-v1.1 openscene_v1.1; do
    move_into "$top/meta_datas" "$ROOT/navsim_logs/$SPLIT"
    move_into "$top/sensor_blobs" "$ROOT/sensor_blobs/$SPLIT"
    rm -rf "$top"
done
move_into private_test_e2e "$ROOT/navsim_logs/$SPLIT"
move_into competition_test "$ROOT/sensor_blobs/$SPLIT"

echo "done -> $ROOT/navsim_logs/$SPLIT ; $ROOT/sensor_blobs/$SPLIT"
