#!/usr/bin/env bash
# Fetch the nuplan maps package and convert it to the framework's
# array-native map format (LocalMapAPI .ddmap.pkl per location).
# Reference analogue: download/download_maps.sh (which stops at the GPKGs —
# this framework additionally converts them so evaluation needs no
# geopandas/Fiona at runtime).
set -euo pipefail

ROOT="${NUPLAN_MAPS_ROOT:-$PWD/maps}"
mkdir -p "$ROOT"
cd "$(dirname "$ROOT")"

wget -c -q --show-progress \
    "https://motional-nuplan.s3-ap-northeast-1.amazonaws.com/public/nuplan-v1.1/nuplan-maps-v1.1.zip"
unzip -q -o nuplan-maps-v1.1.zip
rm -f nuplan-maps-v1.1.zip
[[ -d nuplan-maps-v1.0 && ! -d "$ROOT/us-nv-las-vegas-strip" ]] && rsync -a nuplan-maps-v1.0/ "$ROOT"/ && rm -rf nuplan-maps-v1.0

# one-time conversion (requires geopandas; run wherever it is installed)
python -m diffusiondrive_tpu.planning.convert_maps \
    --nuplan-maps-root "$ROOT" --output-dir "$ROOT/ddmap" \
    || echo "NOTE: GPKG conversion needs geopandas; re-run the python step where it is available."
echo "done -> $ROOT (converted: $ROOT/ddmap)"
