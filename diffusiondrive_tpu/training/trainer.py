"""Training orchestration: epochs, logging, orbax checkpoints.

Replaces the pytorch-lightning Trainer + AgentLightningModule
(`run_training.py:81-138`, `agent_lightning_module.py`). The per-step work is
the jitted sharded train step from `training/train.py`; this class handles the
host loop: batch iteration, metric averaging, callback hooks, a persistent
per-step metrics sink (`metrics.jsonl`, the tensorboard-`log_dict` equivalent
of `agent_lightning_module.py:35`), checkpoint save/restore.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from diffusiondrive_tpu.parallel.mesh import create_mesh, shard_batch
from diffusiondrive_tpu.training.train import (
    OptimizerConfig,
    TrainState,
    create_train_state,
    make_train_step,
    make_val_step,
    replicate_state,
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
        callbacks: Optional[List] = None,
    ):
        self.model = model
        self.model_config = model_config
        self.opt_cfg = opt_cfg
        self.mesh = mesh or create_mesh()
        self.output_dir = Path(output_dir) if output_dir else None
        self.seed = seed
        self.callbacks = list(callbacks or [])
        self.state: Optional[TrainState] = None
        self.last_val_metrics: Dict[str, float] = {}
        self._step_fn = None
        self._val_fn = None
        self._eval_fn = None
        self._metrics_fp = None

    def _hook(self, name: str, *args, **kwargs) -> None:
        """Invoke `name` on every callback that implements it."""
        for cb in self.callbacks:
            fn = getattr(cb, name, None)
            if fn is not None:
                try:
                    fn(*args, **kwargs)
                except Exception:  # noqa: BLE001 — a viz failure must not kill training
                    logger.exception("callback %s.%s failed", type(cb).__name__, name)

    def _log_metrics(self, split: str, epoch: int, step: int, metrics: Dict[str, float]) -> None:
        """Append one row to `<output_dir>/metrics.jsonl` — every loss
        component per step, the persistent equivalent of the reference's
        per-step tensorboard `log_dict` (`agent_lightning_module.py:35`)."""
        if self.output_dir is None:
            return
        if self._metrics_fp is None:
            self.output_dir.mkdir(parents=True, exist_ok=True)
            self._metrics_fp = open(self.output_dir / "metrics.jsonl", "a")
        row = {"split": split, "epoch": epoch, "step": step,
               **{k: round(float(v), 6) for k, v in metrics.items()}}
        self._metrics_fp.write(json.dumps(row) + "\n")
        self._metrics_fp.flush()

    def setup(self, example_batch: Dict[str, np.ndarray]) -> None:
        self.state, tx = create_train_state(
            self.model, jax.random.PRNGKey(self.seed), example_batch, self.opt_cfg
        )
        # commit to the step's output sharding NOW: an uncommitted initial
        # state makes step 1's signature unique and costs a ~95 s (full-size)
        # retrace+recompile at step 2 (see train.replicate_state)
        self.state = replicate_state(self.state, self.mesh)
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
        global_step = 0
        try:
            return self._fit(train_batches, num_epochs, val_batches, log_every,
                             checkpoint_every_epochs, validate_every_epochs, rng,
                             global_step)
        finally:
            if self._metrics_fp is not None:
                self._metrics_fp.close()
                self._metrics_fp = None

    def _fit(self, train_batches, num_epochs, val_batches, log_every,
             checkpoint_every_epochs, validate_every_epochs, rng,
             global_step) -> TrainState:
        with self.mesh:
            for epoch in range(num_epochs):
                self._hook("on_epoch_start", "train", epoch)
                epoch_start = time.perf_counter()
                metrics_acc: Dict[str, float] = {}
                count = 0
                # Deferred metric fetch: reading a loss value blocks until the
                # step finishes, so fetching every step serializes the pipeline
                # (host enqueues step N+1 only after step N's device work AND a
                # host round trip — measured ~2x step time through the tunnel).
                # Steps are enqueued back-to-back and the device scalars are
                # pulled every `log_every` steps / at epoch end; every step
                # still gets its own JSONL row.
                pending: List = []

                def flush_pending() -> Dict[str, float]:
                    last: Dict[str, float] = {}
                    for gstep, dev_metrics in pending:
                        last = {k: float(v) for k, v in dev_metrics.items()}
                        self._log_metrics("train", epoch, gstep, last)
                        for k, v in last.items():
                            metrics_acc[k] = metrics_acc.get(k, 0.0) + v
                    pending.clear()
                    return last

                for batch in train_batches(epoch):
                    if self.state is None:
                        self.setup(batch)
                    sharded = shard_batch(batch, self.mesh)
                    self.state, metrics = self._step_fn(self.state, sharded, rng)
                    count += 1
                    global_step += 1
                    pending.append((global_step, metrics))
                    if count % log_every == 0:
                        logger.info("epoch %d step %d: %s", epoch, count,
                                    {k: round(v, 4) for k, v in flush_pending().items()})
                flush_pending()
                wall = time.perf_counter() - epoch_start
                means = {k: v / max(count, 1) for k, v in metrics_acc.items()}
                logger.info("epoch %d done in %.1fs (%d steps): train %s", epoch, wall, count,
                            {k: round(v, 4) for k, v in means.items()})
                self._hook("on_epoch_end", "train", epoch)

                if val_batches is not None and (epoch + 1) % validate_every_epochs == 0:
                    self._hook("on_epoch_start", "val", epoch)
                    self._validate(val_batches(epoch), epoch, global_step)
                    self._hook("on_epoch_end", "val", epoch)
                if self.output_dir and (epoch + 1) % checkpoint_every_epochs == 0:
                    self.save_checkpoint(epoch)
        return self.state

    def _validate(self, batches: Iterable[Dict[str, np.ndarray]], epoch: int,
                  global_step: int = 0) -> Dict[str, float]:
        """Jitted test-path validation (2-step DDIM forward, the program eval
        runs); when EMA is enabled the EMA weights are validated too. The
        first batch additionally feeds any `on_validation_batch` callbacks
        (BEV viz tiles, `transfuser_callback.py:21` parity) with the eval
        forward's predictions."""
        wants_outputs = any(getattr(cb, "on_validation_batch", None) for cb in self.callbacks)
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
            if count == 0 and wants_outputs:
                if self._eval_fn is None:
                    from diffusiondrive_tpu.training.train import make_eval_step

                    self._eval_fn = jax.jit(make_eval_step(self.model))
                outputs = self._eval_fn(variants[0][1], sharded, rng)
                outputs = {k: np.asarray(v, np.float32) for k, v in outputs.items()}
                self._hook("on_validation_batch", epoch, batch, outputs, 0)
            count += 1
        means = {k: v / max(count, 1) for k, v in totals.items()}
        self.last_val_metrics = means
        self._log_metrics("val", epoch, global_step, means)
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
        self.state = replicate_state(self.state.replace(**restored), self.mesh)
        logger.info("restored checkpoint %s (step %d)", path, int(self.state.step))
