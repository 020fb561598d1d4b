"""Feature/target cache precomputation entry point.

Parity: `navsim/planning/script/run_dataset_caching.py` — computes the gzip
feature cache for the agent's builders over the split (resumable).
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

from diffusiondrive_tpu.common.dataclasses import SceneFilter
from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.config.registry import build_agent, load_split, load_yaml
from diffusiondrive_tpu.training.dataset import Dataset


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--agent", default="diffusiondrive_agent")
    parser.add_argument("--agent-config", default=None)
    parser.add_argument("--navsim-log-path", default=os.environ.get("OPENSCENE_DATA_ROOT"))
    parser.add_argument("--sensor-blobs-path", default=os.environ.get("OPENSCENE_SENSOR_ROOT"))
    parser.add_argument("--split", default=None)
    parser.add_argument("--cache-path", required=True)
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--num-workers", type=int, default=16)
    args = parser.parse_args()

    agent = build_agent(args.agent, **load_yaml(args.agent_config))
    split = load_split(args.split)
    scene_loader = SceneLoader(
        Path(args.navsim_log_path),
        Path(args.sensor_blobs_path) if args.sensor_blobs_path else None,
        SceneFilter(log_names=split["log_names"], tokens=split["tokens"]),
        agent.get_sensor_config(),
    )
    dataset = Dataset(
        scene_loader,
        agent.get_feature_builders(),
        agent.get_target_builders(),
        cache_path=args.cache_path,
        force_cache_computation=args.force,
    )
    logging.info("Cached %d tokens to %s", len(dataset), args.cache_path)


if __name__ == "__main__":
    main()
