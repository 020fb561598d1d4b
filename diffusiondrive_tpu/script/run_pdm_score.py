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
from pathlib import Path

from diffusiondrive_tpu.common.dataloader import MetricCacheLoader, SceneLoader
from diffusiondrive_tpu.config.registry import agent_from_config, load_split, scene_filter_from_split
from diffusiondrive_tpu.evaluate.runner import run_pdm_score_evaluation, write_score_csv
from diffusiondrive_tpu.script.cli_common import add_common_args, resolve_run_config, snapshot_config


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--metric-cache-path", default=None)
    parser.add_argument(
        "--mesh-devices", type=int, default=0,
        help="shard the eval batch over this many local devices "
             "(0 = single-device; -1 = all local devices)")
    args = parser.parse_args()

    cfg = resolve_run_config(args)
    cfg.setdefault("metric_cache_path", args.metric_cache_path)
    if args.metric_cache_path:
        cfg["metric_cache_path"] = args.metric_cache_path
    if not cfg.get("metric_cache_path"):
        parser.error("--metric-cache-path (or metric_cache_path in --config) is required")

    agent = agent_from_config(cfg["agent"])
    split = load_split(cfg.get("split"))
    scene_filter = scene_filter_from_split(split)
    scene_loader = SceneLoader(
        Path(cfg["navsim_log_path"]),
        Path(cfg["sensor_blobs_path"]) if cfg.get("sensor_blobs_path") else None,
        scene_filter,
        agent.get_sensor_config(),
        build_map_api=False,
    )
    metric_cache_loader = MetricCacheLoader(Path(cfg["metric_cache_path"]))

    snapshot_config(cfg, Path(cfg["output_dir"]))
    mesh = None
    n_mesh = int(cfg.get("mesh_devices", args.mesh_devices))
    if n_mesh:
        import jax

        from diffusiondrive_tpu.parallel.mesh import create_mesh

        available = len(jax.devices())
        if n_mesh < -1 or n_mesh > available:
            raise SystemExit(
                f"--mesh-devices must be 0 (no mesh), -1 (all) or 1..{available} "
                f"(have {available} devices), got {n_mesh}"
            )
        devices = jax.devices() if n_mesh == -1 else jax.devices()[:n_mesh]
        mesh = create_mesh(devices)
    rows = run_pdm_score_evaluation(
        agent,
        scene_loader,
        metric_cache_loader,
        batch_size=int(cfg.get("batch_size", 32)),
        host_id=int(cfg.get("host_id", 0)),
        num_hosts=int(cfg.get("num_hosts", 1)),
        mesh=mesh,
    )
    out = write_score_csv(rows, Path(cfg["output_dir"]))
    print(json.dumps({"output_csv": str(out), "num_tokens": len(rows)}))


if __name__ == "__main__":
    main()
