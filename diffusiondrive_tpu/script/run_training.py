"""Training entry point.

Parity: `navsim/planning/script/run_training.py` — builds the agent's
feature/target builders, caches or loads the dataset, and runs the pjit
data-parallel train loop.

Example:
    python -m diffusiondrive_tpu.script.run_training \
        --agent diffusiondrive_agent --cache-path $NAVSIM_EXP_ROOT/training_cache \
        --epochs 100 --batch-size 64
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

from diffusiondrive_tpu.common.dataclasses import SceneFilter
from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.config.registry import build_agent, load_split, load_yaml
from diffusiondrive_tpu.training.dataset import CacheOnlyDataset, Dataset, batch_iterator
from diffusiondrive_tpu.training.train import OptimizerConfig
from diffusiondrive_tpu.training.trainer import Trainer


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--agent", default="diffusiondrive_agent")
    parser.add_argument("--agent-config", default=None)
    parser.add_argument("--navsim-log-path", default=os.environ.get("OPENSCENE_DATA_ROOT"))
    parser.add_argument("--sensor-blobs-path", default=os.environ.get("OPENSCENE_SENSOR_ROOT"))
    parser.add_argument("--split", default=None)
    parser.add_argument("--cache-path", required=True, help="feature/target cache directory")
    parser.add_argument("--cache-only", action="store_true", help="train purely from cache")
    parser.add_argument("--output-dir", default=os.environ.get("NAVSIM_EXP_ROOT", "exp"))
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--warmup-epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=6e-4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import json

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "config.json", "w") as fp:
        json.dump({k: str(v) for k, v in vars(args).items()}, fp, indent=2)

    agent = build_agent(args.agent, **load_yaml(args.agent_config))
    feature_builders = agent.get_feature_builders()
    target_builders = agent.get_target_builders()

    if args.cache_only:
        dataset = CacheOnlyDataset(args.cache_path, feature_builders, target_builders)
    else:
        split = load_split(args.split)
        scene_loader = SceneLoader(
            Path(args.navsim_log_path),
            Path(args.sensor_blobs_path) if args.sensor_blobs_path else None,
            SceneFilter(log_names=split["log_names"], tokens=split["tokens"]),
            agent.get_sensor_config(),
        )
        dataset = Dataset(scene_loader, feature_builders, target_builders, cache_path=args.cache_path)

    if not hasattr(agent, "model"):
        raise SystemExit(f"Agent '{args.agent}' does not support training.")

    from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel

    if not isinstance(agent.model, DiffusionDriveModel):
        # simple agents (e.g. ego_status_mlp_agent) train via the generic loop
        from diffusiondrive_tpu.training.generic import train_agent

        train_agent(agent, dataset, args.batch_size, args.epochs, seed=args.seed)
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(Path(args.output_dir).absolute() / "final", agent.variables, force=True)
        ckptr.wait_until_finished()
        ckptr.close()
        return

    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    opt_cfg = OptimizerConfig(
        lr=args.lr,
        epochs=args.epochs,
        warmup_epochs=args.warmup_epochs,
        steps_per_epoch=steps_per_epoch,
        weight_decay=agent.config.weight_decay if hasattr(agent, "config") else 1e-4,
    )
    trainer = Trainer(agent.model, agent.config, opt_cfg, output_dir=args.output_dir, seed=args.seed)
    trainer.fit(
        lambda epoch: batch_iterator(dataset, args.batch_size, shuffle=True, seed=args.seed + epoch),
        num_epochs=args.epochs,
    )


if __name__ == "__main__":
    main()
