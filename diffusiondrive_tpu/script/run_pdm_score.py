"""PDMS evaluation entry point.

Parity: `navsim/planning/script/run_pdm_score.py` (hydra CLI -> argparse).

Example:
    python -m diffusiondrive_tpu.script.run_pdm_score \
        --agent diffusiondrive_agent \
        --navsim-log-path $OPENSCENE_DATA_ROOT/navsim_logs/test \
        --sensor-blobs-path $OPENSCENE_DATA_ROOT/sensor_blobs/test \
        --metric-cache-path $NAVSIM_EXP_ROOT/metric_cache \
        --split splits/navtest.yaml --output-dir $NAVSIM_EXP_ROOT/eval
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from pathlib import Path

from diffusiondrive_tpu.common.dataclasses import SceneFilter
from diffusiondrive_tpu.common.dataloader import MetricCacheLoader, SceneLoader
from diffusiondrive_tpu.config.registry import build_agent, load_split, load_yaml
from diffusiondrive_tpu.evaluate.runner import run_pdm_score_evaluation, write_score_csv


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--navsim-log-path", default=os.environ.get("OPENSCENE_DATA_ROOT"))
    parser.add_argument("--sensor-blobs-path", default=os.environ.get("OPENSCENE_SENSOR_ROOT"))
    parser.add_argument("--split", default=None, help="YAML with log_names/tokens lists")
    parser.add_argument("--output-dir", default=os.environ.get("NAVSIM_EXP_ROOT", "exp"))
    parser.add_argument("--agent", default="constant_velocity_agent")
    parser.add_argument("--agent-config", default=None, help="YAML of agent kwargs")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--host-id", type=int, default=int(os.environ.get("HOST_ID", 0)))
    parser.add_argument("--num-hosts", type=int, default=int(os.environ.get("NUM_HOSTS", 1)))


def _snapshot_config(config: dict, output_dir: Path) -> None:
    """Persist the resolved run config (hydra snapshot parity)."""
    output_dir.mkdir(parents=True, exist_ok=True)
    with open(output_dir / "config.json", "w") as fp:
        json.dump({k: str(v) for k, v in config.items()}, fp, indent=2)


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--metric-cache-path", required=True)
    args = parser.parse_args()

    agent = build_agent(args.agent, **load_yaml(args.agent_config))
    split = load_split(args.split)
    scene_filter = SceneFilter(log_names=split["log_names"], tokens=split["tokens"])
    scene_loader = SceneLoader(
        Path(args.navsim_log_path),
        Path(args.sensor_blobs_path) if args.sensor_blobs_path else None,
        scene_filter,
        agent.get_sensor_config(),
        build_map_api=False,
    )
    metric_cache_loader = MetricCacheLoader(Path(args.metric_cache_path))

    _snapshot_config(vars(args), Path(args.output_dir))
    rows = run_pdm_score_evaluation(
        agent,
        scene_loader,
        metric_cache_loader,
        batch_size=args.batch_size,
        host_id=args.host_id,
        num_hosts=args.num_hosts,
    )
    out = write_score_csv(rows, Path(args.output_dir))
    print(json.dumps({"output_csv": str(out), "num_tokens": len(rows)}))


if __name__ == "__main__":
    main()
