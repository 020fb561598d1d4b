"""Metric caching entry point.

Parity: `navsim/planning/script/run_metric_caching.py`.

Example:
    python -m diffusiondrive_tpu.script.run_metric_caching \
        --navsim-log-path ... --metric-cache-path $NAVSIM_EXP_ROOT/metric_cache
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.config.registry import load_split
from diffusiondrive_tpu.planning.metric_caching import cache_data


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--navsim-log-path", default=os.environ.get("OPENSCENE_DATA_ROOT"))
    parser.add_argument("--split", default=None)
    parser.add_argument("--metric-cache-path", required=True)
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--host-id", type=int, default=int(os.environ.get("HOST_ID", 0)))
    parser.add_argument("--num-hosts", type=int, default=int(os.environ.get("NUM_HOSTS", 1)))
    args = parser.parse_args()

    split = load_split(args.split)
    scene_loader = SceneLoader(
        Path(args.navsim_log_path),
        None,
        SceneFilter(log_names=split["log_names"], tokens=split["tokens"]),
        SensorConfig.build_no_sensors(),
    )
    cache_data(
        scene_loader,
        args.metric_cache_path,
        force=args.force,
        num_workers=args.num_workers,
        host_id=args.host_id,
        num_hosts=args.num_hosts,
    )


if __name__ == "__main__":
    main()
