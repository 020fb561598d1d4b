"""Feature/target cache precomputation entry point.

Parity: `navsim/planning/script/run_dataset_caching.py` — computes the gzip
feature cache for the agent's builders over the split (resumable).
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.config.registry import agent_from_config, load_split, scene_filter_from_split
from diffusiondrive_tpu.script.cli_common import add_common_args, resolve_run_config, snapshot_config
from diffusiondrive_tpu.training.dataset import Dataset


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser, default_agent="diffusiondrive_agent")
    parser.add_argument("--cache-path", default=None)
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--num-workers", type=int, default=16)
    args = parser.parse_args()

    cfg = resolve_run_config(args)
    if args.cache_path:
        cfg["cache_path"] = args.cache_path
    if not cfg.get("cache_path"):
        parser.error("--cache-path (or cache_path in --config) is required")
    snapshot_config(cfg, Path(cfg["output_dir"]))

    agent = agent_from_config(cfg["agent"])
    split = load_split(cfg.get("split"))
    scene_loader = SceneLoader(
        Path(cfg["navsim_log_path"]),
        Path(cfg["sensor_blobs_path"]) if cfg.get("sensor_blobs_path") else None,
        scene_filter_from_split(split),
        agent.get_sensor_config(),
    )
    dataset = Dataset(
        scene_loader,
        agent.get_feature_builders(),
        agent.get_target_builders(),
        cache_path=cfg["cache_path"],
        force_cache_computation=bool(cfg.get("force")),
    )
    logging.info("Cached %d tokens to %s", len(dataset), cfg["cache_path"])


if __name__ == "__main__":
    main()
