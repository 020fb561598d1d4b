"""JAX training runtime: optimizer, train/eval steps, sharded train loop.

Replaces the PyTorch-Lightning runtime of the reference
(`agent_lightning_module.py`, `run_training.py:81-138`, DDP config
`default_training.yaml:40-44`) with a pjit data-parallel loop:

- AdamW with per-module LR multipliers (image encoder x0.5,
  `transfuser_agent.py:149-207`) and WarmupCosLR,
- one jitted `train_step`: forward + loss (incl. in-graph Hungarian) +
  backward + update, batch sharded over the mesh `data` axis, gradients
  all-reduced over ICI by the SPMD partitioner,
- orbax checkpointing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, PartitionSpec as P

from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.parallel.mesh import batch_sharding, replicated
from diffusiondrive_tpu.training.losses import transfuser_loss
from diffusiondrive_tpu.training.scheduler import warmup_cos_lr


class TrainState(struct.PyTreeNode):
    """Carries everything the jitted step mutates."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any
    ema_params: Any = None  # populated when OptimizerConfig.ema_decay is set


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 6e-4
    min_lr: float = 1e-6
    weight_decay: float = 1e-4
    epochs: int = 100
    warmup_epochs: int = 3
    steps_per_epoch: int = 1
    image_encoder_lr_mult: float = 0.5
    grad_clip_norm: Optional[float] = None
    ema_decay: Optional[float] = None  # e.g. 0.999 (config use_ema parity)


def _param_labels(params: Any) -> Any:
    """Label params under the image encoder for the reduced LR group
    (parity: `opt_paramwise_cfg` `transfuser_config.py:127`)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of_path(path) -> str:
        keys = "/".join(getattr(p, "key", str(p)) for p in path)
        return "image_encoder" if "image_encoder" in keys else "default"

    labels_flat = [label_of_path(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels_flat)


def build_optimizer(opt_cfg: OptimizerConfig, params: Any) -> optax.GradientTransformation:
    def adamw(lr_mult: float) -> optax.GradientTransformation:
        schedule = warmup_cos_lr(
            opt_cfg.lr * lr_mult,
            opt_cfg.min_lr * lr_mult,
            opt_cfg.epochs,
            opt_cfg.warmup_epochs,
            opt_cfg.steps_per_epoch,
        )
        return optax.adamw(schedule, weight_decay=opt_cfg.weight_decay)

    tx = optax.multi_transform(
        {"default": adamw(1.0), "image_encoder": adamw(opt_cfg.image_encoder_lr_mult)},
        _param_labels(params),
    )
    if opt_cfg.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(opt_cfg.grad_clip_norm), tx)
    return tx


def create_train_state(
    model,
    rng: jax.Array,
    example_batch: Dict[str, jnp.ndarray],
    opt_cfg: OptimizerConfig,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize params/batch-stats/constants and the optimizer."""
    init_rngs = {"params": rng, "diffusion": rng, "dropout": rng}
    variables = jax.jit(model.init)(
        init_rngs,
        example_batch["camera_feature"],
        example_batch["lidar_feature"],
        example_batch["status_feature"],
    )
    params = variables["params"]
    tx = build_optimizer(opt_cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", FrozenDict()),
        constants=variables.get("constants", FrozenDict()),
        opt_state=tx.init(params),
        # DEEP-COPY, never alias: `ema_params=params` puts the SAME buffer in
        # the donated state twice, and donating one buffer through two tree
        # leaves fails at runtime on TPU ("TPU backend error (InvalidArgument)",
        # full-size model, batch>=8 — round-4 bisect: the copied-EMA variant
        # passes, the aliased one fails). This was the round-2 mystery that
        # forced donation off whenever EMA was on.
        ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                    if opt_cfg.ema_decay is not None else None),
    )
    return state, tx


def make_loss_fn(model, config: TransfuserConfig) -> Callable:
    """The train-path loss: forward (train=True, mutable batch stats) + the
    full `transfuser_loss` suite, with the per-step rng folding the train
    step uses. Shared by `make_train_step` and the multichip dryrun's
    1-device golden-loss recomputation (`__graft_entry__.dryrun_multichip`),
    so the two can never diverge."""

    def loss_fn(params, batch_stats, constants, batch: Dict[str, jnp.ndarray],
                rng: jax.Array, step: jnp.ndarray):
        step_rng = jax.random.fold_in(rng, step)
        diffusion_rng, dropout_rng = jax.random.split(step_rng)
        targets = {
            "trajectory": batch["trajectory"],
            "agent_states": batch["agent_states"],
            "agent_labels": batch["agent_labels"],
            "bev_semantic_map": batch["bev_semantic_map"],
        }
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats, "constants": constants},
            batch["camera_feature"],
            batch["lidar_feature"],
            batch["status_feature"],
            targets=targets,
            train=True,
            rngs={"diffusion": diffusion_rng, "dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        loss_dict = transfuser_loss(targets, outputs, config)
        return loss_dict["loss"], (loss_dict, mutated.get("batch_stats", batch_stats))

    return loss_fn


def make_train_step(
    model, config: TransfuserConfig, tx: optax.GradientTransformation,
    ema_decay: Optional[float] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the (unjitted) train step; jit/shard it with `shard_train_step`."""

    loss_fn = make_loss_fn(model, config)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        grads, (loss_dict, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.constants, batch, rng, state.step)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, state.ema_params, new_params
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, loss_dict

    return train_step


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Commit a freshly created state to the replicated sharding that the
    sharded step outputs.

    `create_train_state` leaves arrays uncommitted (default placement), while
    every state a sharded step RETURNS is committed to `replicated(mesh)`.
    Passing the uncommitted state to the first step therefore gives call 1 a
    different signature from every later call, which costs one full extra
    retrace + recompile at step 2 (profiled at ~95 s host time on the
    full-size model: a 1M-event trace of pure `trace_to_jaxpr`, zero device
    work). Committing the state first makes step 1 and step N share one
    compiled program.
    """
    return jax.device_put(state, replicated(mesh))


def shard_train_step(train_step: Callable, mesh: Mesh, ema: bool = False) -> Callable:
    """jit the step with batch sharded over `data`, state replicated.

    The SPMD partitioner turns the implied gradient reduction into a single
    ICI all-reduce per step — the TPU equivalent of DDP.

    State buffers are donated on accelerators (halves peak param+opt memory),
    with one carve-out:
    - CPU meshes: the historical full-suite aborts were traced to XLA:CPU's
      40 s collective rendezvous termination under host load (now raised via
      XLA_FLAGS in conftest/__graft_entry__), but donation stays off on CPU —
      it buys nothing there and keeps the test path simple.

    EMA-enabled steps used to be a second carve-out: the round-2 bisect
    showed full-size donate+EMA failing with "TPU backend error
    (InvalidArgument)" at batch>=8. Round 4 root-caused it: the state
    ALIASED `ema_params` to `params` (one buffer, two donated leaves).
    `create_train_state` now deep-copies the EMA leaves, and the
    donated+EMA full-size step passes on the v5e (two steps, loss
    573.7 -> 537.9), so donation stays on with EMA — saving a full
    params+opt HBM copy on the production config.
    """
    batch_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    del ema  # no longer a donation carve-out; kept for call-site compat
    donate_state = mesh.devices.flat[0].platform != "cpu"
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def make_val_step(model, config: TransfuserConfig) -> Callable:
    """Validation step running the *test-path* forward (truncated 2-step DDIM,
    the planner program an eval run uses) plus the loss suite and open-loop
    trajectory metrics (ADE/FDE). Unlike the reference's validation (which
    replays the train path, `agent_lightning_module.py:38-44`), this validates
    what inference actually executes."""

    def val_step(variables: Dict[str, Any], batch: Dict[str, jnp.ndarray], rng: jax.Array):
        targets = {
            "trajectory": batch["trajectory"],
            "agent_states": batch["agent_states"],
            "agent_labels": batch["agent_labels"],
            "bev_semantic_map": batch["bev_semantic_map"],
        }
        outputs = model.apply(
            variables,
            batch["camera_feature"],
            batch["lidar_feature"],
            batch["status_feature"],
            train=False,
            rngs={"diffusion": rng},
        )
        metrics = dict(transfuser_loss(targets, outputs, config))
        l2 = jnp.linalg.norm(
            outputs["trajectory"][..., :2].astype(jnp.float32) - targets["trajectory"][..., :2],
            axis=-1,
        )
        metrics["ade"] = l2.mean()
        metrics["fde"] = l2[:, -1].mean()
        return metrics

    return val_step


def shard_val_step(val_step: Callable, mesh: Mesh) -> Callable:
    """jit the validation step with the batch sharded over `data`."""
    return jax.jit(
        val_step,
        in_shardings=(replicated(mesh), batch_sharding(mesh), replicated(mesh)),
        out_shardings=replicated(mesh),
    )


def make_eval_step(model) -> Callable:
    """Planner forward (test path) for batched evaluation."""

    def eval_step(variables, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        return model.apply(
            variables,
            batch["camera_feature"],
            batch["lidar_feature"],
            batch["status_feature"],
            rngs={"diffusion": rng},
        )

    return eval_step
