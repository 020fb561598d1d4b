#!/usr/bin/env bash
# Full trainval sensor blobs from HuggingFace (32 camera + 32 lidar shards).
# Reference analogue: download/download_trainval.sh. For the smaller navtrain
# subset used by DiffusionDrive training, prefer download_navtrain.sh.
set -euo pipefail

ROOT="${OPENSCENE_DATA_ROOT:-$PWD}"
HF_BASE="https://huggingface.co/datasets/OpenDriveLab/OpenScene/resolve/main/openscene-v1.1"
WORK="$ROOT/.openscene_download"
mkdir -p "$WORK" "$ROOT/navsim_logs" "$ROOT/sensor_blobs"
cd "$WORK"

wget -c -q --show-progress "$HF_BASE/openscene_metadata_trainval.tgz"
tar -xzf openscene_metadata_trainval.tgz && rm -f openscene_metadata_trainval.tgz

for kind in camera lidar; do
    for i in $(seq 0 199); do
        echo "== trainval ${kind} shard ${i}/199"
        wget -c -q --show-progress "$HF_BASE/openscene_sensor_trainval_${kind}/openscene_sensor_trainval_${kind}_${i}.tgz"
        tar -xzf "openscene_sensor_trainval_${kind}_${i}.tgz"
        rm -f "openscene_sensor_trainval_${kind}_${i}.tgz"
    done
done

if [[ -d openscene-v1.1 ]]; then
    rsync -a openscene-v1.1/meta_datas/ "$ROOT/navsim_logs/trainval"/ 2>/dev/null || true
    rsync -a openscene-v1.1/sensor_blobs/ "$ROOT/sensor_blobs/trainval"/ 2>/dev/null || true
    rm -rf openscene-v1.1
fi
echo "done -> $ROOT/navsim_logs/trainval ; $ROOT/sensor_blobs/trainval"
