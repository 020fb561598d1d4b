#!/usr/bin/env bash
# Fetch the navtrain sensor blobs (AVG S3 mirror; current + history frames)
# plus the trainval metadata, into the SceneLoader layout.
# Reference analogue: download/download_navtrain.sh.
set -euo pipefail

ROOT="${OPENSCENE_DATA_ROOT:-$PWD}"
HF_BASE="https://huggingface.co/datasets/OpenDriveLab/OpenScene/resolve/main/openscene-v1.1"
S3_BASE="https://s3.eu-central-1.amazonaws.com/avg-projects-2/navsim"
WORK="$ROOT/.openscene_download"
DEST="$ROOT/sensor_blobs/trainval"
mkdir -p "$WORK" "$DEST" "$ROOT/navsim_logs"
cd "$WORK"

echo "== trainval metadata"
wget -c -q --show-progress "$HF_BASE/openscene_metadata_trainval.tgz"
tar -xzf openscene_metadata_trainval.tgz && rm -f openscene_metadata_trainval.tgz
if [[ -d openscene-v1.1/meta_datas ]]; then
    rsync -a openscene-v1.1/meta_datas/ "$ROOT/navsim_logs/trainval"/
    rm -rf openscene-v1.1
fi

for part in current history; do
    for i in 1 2 3 4; do
        echo "== navtrain ${part} shard ${i}/4"
        wget -c -q --show-progress "$S3_BASE/navtrain_${part}_${i}.tgz"
        tar -xzf "navtrain_${part}_${i}.tgz"
        rm -f "navtrain_${part}_${i}.tgz"
        rsync -a "${part}_split_${i}"/ "$DEST"/
        rm -rf "${part}_split_${i}"
    done
done
echo "done -> $ROOT/navsim_logs/trainval ; $DEST"
