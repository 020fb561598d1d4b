"""Shared CLI plumbing for the `run_*` entry points.

Every entry point accepts the same two operating modes:
- legacy flags (`--agent ... --split ...`), or
- `--config <name|path>` + positional `key=value` / `group=name` overrides,
  composed by `config/compose.py` from the layered `configs/` tree.

The resolved config dict is snapshotted to `<output_dir>/config.yaml`, so any
run is reproducible with `--config <snapshot>` and nothing else
(hydra-snapshot parity, `default_training.yaml:4`).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

from diffusiondrive_tpu.config.registry import load_yaml


def add_common_args(parser: argparse.ArgumentParser, default_agent: str = "constant_velocity_agent") -> None:
    parser.add_argument("--config", default=None,
                        help="composed config (name under configs/ or a YAML path); "
                             "positional key=value / group=name overrides apply to it")
    parser.add_argument("--navsim-log-path", default=os.environ.get("OPENSCENE_DATA_ROOT"))
    parser.add_argument("--sensor-blobs-path", default=os.environ.get("OPENSCENE_SENSOR_ROOT"))
    parser.add_argument("--split", default=None, help="split name in splits/ or a YAML path")
    parser.add_argument("--output-dir", default=os.environ.get("NAVSIM_EXP_ROOT", "exp"))
    parser.add_argument("--agent", default=default_agent)
    parser.add_argument("--agent-config", default=None, help="YAML of agent kwargs")
    parser.add_argument("--host-id", type=int, default=int(os.environ.get("HOST_ID", 0)))
    parser.add_argument("--num-hosts", type=int, default=int(os.environ.get("NUM_HOSTS", 1)))
    parser.add_argument("overrides", nargs="*", default=[],
                        help="config overrides (with --config)")


def resolve_run_config(args: argparse.Namespace) -> dict:
    """Run settings: composed config (+ overrides) when --config is given,
    else the legacy flags mapped onto the same keys."""
    from diffusiondrive_tpu.config.compose import compose

    if args.config:
        return compose(args.config, args.overrides)
    cfg = {k: v for k, v in vars(args).items() if k not in ("config", "overrides")}
    if hasattr(args, "agent"):
        cfg["agent"] = {"name": args.agent, **load_yaml(getattr(args, "agent_config", None))}
        cfg.pop("agent_config", None)
    return cfg


def snapshot_config(config: dict, output_dir: Path) -> None:
    """Persist the resolved run config (hydra snapshot parity)."""
    from diffusiondrive_tpu.config.compose import snapshot

    snapshot(config, Path(output_dir))
