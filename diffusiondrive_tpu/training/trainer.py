"""Training orchestration: epochs, logging, orbax checkpoints.

Replaces the pytorch-lightning Trainer + AgentLightningModule
(`run_training.py:81-138`, `agent_lightning_module.py`). The per-step work is
the jitted sharded train step from `training/train.py`; this class handles the
host loop: batch iteration, metric averaging, wall-time logging
(TimeLoggingCallback parity), checkpoint save/restore.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from diffusiondrive_tpu.parallel.mesh import create_mesh, shard_batch
from diffusiondrive_tpu.training.train import (
    OptimizerConfig,
    TrainState,
    create_train_state,
    make_train_step,
    make_val_step,
    shard_train_step,
    shard_val_step,
)

logger = logging.getLogger(__name__)


class Trainer:
    """Data-parallel train loop over a device mesh."""

    def __init__(
        self,
        model,
        model_config,
        opt_cfg: OptimizerConfig,
        output_dir: Optional[str] = None,
        mesh=None,
        seed: int = 0,
    ):
        self.model = model
        self.model_config = model_config
        self.opt_cfg = opt_cfg
        self.mesh = mesh or create_mesh()
        self.output_dir = Path(output_dir) if output_dir else None
        self.seed = seed
        self.state: Optional[TrainState] = None
        self.last_val_metrics: Dict[str, float] = {}
        self._step_fn = None
        self._val_fn = None

    def setup(self, example_batch: Dict[str, np.ndarray]) -> None:
        self.state, tx = create_train_state(
            self.model, jax.random.PRNGKey(self.seed), example_batch, self.opt_cfg
        )
        self._step_fn = shard_train_step(
            make_train_step(self.model, self.model_config, tx, ema_decay=self.opt_cfg.ema_decay),
            self.mesh,
            ema=self.opt_cfg.ema_decay is not None,
        )
        self._val_fn = shard_val_step(make_val_step(self.model, self.model_config), self.mesh)

    def _variables(self, use_ema: bool = False) -> Dict:
        params = self.state.ema_params if (use_ema and self.state.ema_params is not None) else self.state.params
        return {"params": params, "batch_stats": self.state.batch_stats,
                "constants": self.state.constants}

    def fit(
        self,
        train_batches: Callable[[int], Iterable[Dict[str, np.ndarray]]],
        num_epochs: int,
        val_batches: Optional[Callable[[int], Iterable[Dict[str, np.ndarray]]]] = None,
        log_every: int = 50,
        checkpoint_every_epochs: int = 1,
        validate_every_epochs: int = 1,
    ) -> TrainState:
        rng = jax.random.PRNGKey(self.seed + 1)
        with self.mesh:
            for epoch in range(num_epochs):
                epoch_start = time.perf_counter()
                metrics_acc: Dict[str, float] = {}
                count = 0
                for batch in train_batches(epoch):
                    if self.state is None:
                        self.setup(batch)
                    sharded = shard_batch(batch, self.mesh)
                    self.state, metrics = self._step_fn(self.state, sharded, rng)
                    count += 1
                    if count % log_every == 0:
                        metrics = {k: float(v) for k, v in metrics.items()}
                        logger.info("epoch %d step %d: %s", epoch, count,
                                    {k: round(v, 4) for k, v in metrics.items()})
                    for k, v in jax.tree_util.tree_map(float, metrics).items():
                        metrics_acc[k] = metrics_acc.get(k, 0.0) + v
                wall = time.perf_counter() - epoch_start
                means = {k: v / max(count, 1) for k, v in metrics_acc.items()}
                logger.info("epoch %d done in %.1fs (%d steps): train %s", epoch, wall, count,
                            {k: round(v, 4) for k, v in means.items()})

                if val_batches is not None and (epoch + 1) % validate_every_epochs == 0:
                    self._validate(val_batches(epoch), epoch)
                if self.output_dir and (epoch + 1) % checkpoint_every_epochs == 0:
                    self.save_checkpoint(epoch)
        return self.state

    def _validate(self, batches: Iterable[Dict[str, np.ndarray]], epoch: int) -> Dict[str, float]:
        """Jitted test-path validation (2-step DDIM forward, the program eval
        runs); when EMA is enabled the EMA weights are validated too."""
        totals: Dict[str, float] = {}
        count = 0
        rng = jax.random.PRNGKey(0)  # fixed key: deterministic val noise draw
        variants = [("", self._variables(use_ema=False))]
        if self.state.ema_params is not None:
            variants.append(("ema_", self._variables(use_ema=True)))
        for batch in batches:
            sharded = shard_batch(batch, self.mesh)
            for prefix, variables in variants:
                metrics = self._val_fn(variables, sharded, rng)
                for k, v in metrics.items():
                    totals[prefix + k] = totals.get(prefix + k, 0.0) + float(v)
            count += 1
        means = {k: v / max(count, 1) for k, v in totals.items()}
        self.last_val_metrics = means
        logger.info("epoch %d val: %s", epoch, {k: round(v, 4) for k, v in means.items()})
        return means

    def save_checkpoint(self, epoch: int) -> None:
        import orbax.checkpoint as ocp

        path = (self.output_dir / f"epoch_{epoch:04d}").absolute()
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": self.state.params, "batch_stats": self.state.batch_stats,
                   "constants": self.state.constants, "opt_state": self.state.opt_state,
                   "step": self.state.step}
        if self.state.ema_params is not None:
            payload["ema_params"] = self.state.ema_params
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        ckptr.close()
        logger.info("saved checkpoint %s", path)

    def restore_checkpoint(self, path: str) -> None:
        """Resume training state (params + optimizer + step) from a checkpoint."""
        import orbax.checkpoint as ocp

        assert self.state is not None, "call setup() with an example batch first"
        target = {
            "params": self.state.params, "batch_stats": self.state.batch_stats,
            "constants": self.state.constants, "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        if self.state.ema_params is not None:
            target["ema_params"] = self.state.ema_params
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(Path(path).absolute(), target)
        ckptr.close()
        self.state = self.state.replace(**restored)
        logger.info("restored checkpoint %s (step %d)", path, int(self.state.step))
