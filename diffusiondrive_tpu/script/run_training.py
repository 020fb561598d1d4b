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
from pathlib import Path

from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.config.registry import agent_from_config, load_split, scene_filter_from_split
from diffusiondrive_tpu.script.cli_common import add_common_args, resolve_run_config, snapshot_config
from diffusiondrive_tpu.training.dataset import CacheOnlyDataset, Dataset, batch_iterator
from diffusiondrive_tpu.training.train import OptimizerConfig
from diffusiondrive_tpu.training.trainer import Trainer


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser, default_agent="diffusiondrive_agent")
    parser.add_argument("--cache-path", default=None, help="feature/target cache directory")
    parser.add_argument("--cache-only", action="store_true", help="train purely from cache")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--warmup-epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=6e-4)
    parser.add_argument("--ema-decay", type=float, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    cfg = resolve_run_config(args)
    if args.cache_path:
        cfg["cache_path"] = args.cache_path
    if not cfg.get("cache_path"):
        parser.error("--cache-path (or cache_path in --config) is required")
    snapshot_config(cfg, Path(cfg["output_dir"]))

    # precision -> model compute dtype (params/optimizer stay fp32; parity:
    # the reference's `precision: 16-mixed`, `default_training.yaml:43`)
    precision = str(cfg.get("precision", "bf16-mixed"))
    dtype_of = {"bf16-mixed": "bfloat16", "16-mixed": "bfloat16",
                "fp32": "float32", "32": "float32", "float32": "float32"}
    if precision not in dtype_of:
        raise ValueError(
            f"unknown precision {precision!r}; expected one of {sorted(dtype_of)}")
    if "diffusion" in cfg["agent"]["name"] or "transfuser" in cfg["agent"]["name"]:
        cfg["agent"].setdefault("dtype", dtype_of[precision])
    agent = agent_from_config(cfg["agent"])
    feature_builders = agent.get_feature_builders()
    target_builders = agent.get_target_builders()

    epochs = int(cfg.get("epochs", 100))
    batch_size = int(cfg.get("batch_size", 64))
    seed = int(cfg.get("seed", 0))

    if cfg.get("cache_only"):
        dataset = CacheOnlyDataset(cfg["cache_path"], feature_builders, target_builders)
    else:
        split = load_split(cfg.get("split"))
        scene_loader = SceneLoader(
            Path(cfg["navsim_log_path"]),
            Path(cfg["sensor_blobs_path"]) if cfg.get("sensor_blobs_path") else None,
            scene_filter_from_split(split),
            agent.get_sensor_config(),
        )
        dataset = Dataset(scene_loader, feature_builders, target_builders,
                          cache_path=cfg["cache_path"])

    if not hasattr(agent, "model"):
        raise SystemExit(f"Agent '{cfg['agent']['name']}' does not support training.")

    from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel

    if not isinstance(agent.model, DiffusionDriveModel):
        # simple agents (e.g. ego_status_mlp_agent) train via the generic loop
        from diffusiondrive_tpu.training.generic import train_agent

        train_agent(agent, dataset, batch_size, epochs, seed=seed)
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(Path(cfg["output_dir"]).absolute() / "final", agent.variables, force=True)
        ckptr.wait_until_finished()
        ckptr.close()
        return

    steps_per_epoch = max(len(dataset) // batch_size, 1)
    opt_cfg = OptimizerConfig(
        lr=float(cfg.get("lr", 6e-4)),
        epochs=epochs,
        warmup_epochs=int(cfg.get("warmup_epochs", 3)),
        steps_per_epoch=steps_per_epoch,
        weight_decay=agent.config.weight_decay if hasattr(agent, "config") else 1e-4,
        ema_decay=cfg.get("ema_decay"),
    )
    trainer = Trainer(agent.model, agent.config, opt_cfg, output_dir=cfg["output_dir"], seed=seed,
                      callbacks=agent.get_training_callbacks(output_dir=cfg["output_dir"]))
    val_batches = None
    if cfg.get("val_split"):
        val_split = load_split(cfg["val_split"])
        val_loader = SceneLoader(
            Path(cfg["navsim_log_path"]),
            Path(cfg["sensor_blobs_path"]) if cfg.get("sensor_blobs_path") else None,
            scene_filter_from_split(val_split),
            agent.get_sensor_config(),
        )
        val_dataset = Dataset(val_loader, feature_builders, target_builders,
                              cache_path=cfg["cache_path"])
        val_batches = lambda epoch: batch_iterator(val_dataset, batch_size, shuffle=False)  # noqa: E731
    trainer.fit(
        lambda epoch: batch_iterator(dataset, batch_size, shuffle=True, seed=seed + epoch),
        num_epochs=epochs,
        val_batches=val_batches,
        checkpoint_every_epochs=int(cfg.get("checkpoint_every_epochs", 1)),
    )


if __name__ == "__main__":
    main()
