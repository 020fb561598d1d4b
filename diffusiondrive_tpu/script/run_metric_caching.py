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

from diffusiondrive_tpu.common.dataclasses import SensorConfig
from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.config.registry import load_split, scene_filter_from_split
from diffusiondrive_tpu.script.cli_common import resolve_run_config, snapshot_config
from diffusiondrive_tpu.planning.metric_caching import cache_data


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None,
                        help="composed config (name under configs/ or a YAML path)")
    parser.add_argument("--navsim-log-path", default=os.environ.get("OPENSCENE_DATA_ROOT"))
    parser.add_argument("--split", default=None)
    parser.add_argument("--output-dir", default=os.environ.get("NAVSIM_EXP_ROOT", "exp"))
    parser.add_argument("--metric-cache-path", default=None)
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--host-id", type=int, default=int(os.environ.get("HOST_ID", 0)))
    parser.add_argument("--num-hosts", type=int, default=int(os.environ.get("NUM_HOSTS", 1)))
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args()

    cfg = resolve_run_config(args)
    if args.metric_cache_path:
        cfg["metric_cache_path"] = args.metric_cache_path
    if not cfg.get("metric_cache_path"):
        parser.error("--metric-cache-path (or metric_cache_path in --config) is required")
    snapshot_config(cfg, Path(cfg["output_dir"]))

    split = load_split(cfg.get("split"))
    scene_loader = SceneLoader(
        Path(cfg["navsim_log_path"]),
        None,
        scene_filter_from_split(split),
        SensorConfig.build_no_sensors(),
    )
    num_workers = cfg.get("num_workers") or (cfg.get("worker") or {}).get("max_workers", 8)
    cache_data(
        scene_loader,
        cfg["metric_cache_path"],
        force=bool(cfg.get("force")),
        num_workers=int(num_workers),
        host_id=int(cfg.get("host_id", 0)),
        num_hosts=int(cfg.get("num_hosts", 1)),
    )


if __name__ == "__main__":
    main()
