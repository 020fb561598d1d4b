"""Learning-rate schedules.

Parity: `navsim/agents/diffusiondrive/modules/scheduler.py:6-59` (WarmupCosLR:
linear warmup over `warmup_epochs`, then cosine decay to `min_lr` across
`epochs`). Expressed as an optax schedule over *steps* so it drops into the
jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cos_lr(
    lr: float,
    min_lr: float,
    epochs: int,
    warmup_epochs: int,
    steps_per_epoch: int = 1,
) -> optax.Schedule:
    """WarmupCosLR with per-epoch granularity when steps_per_epoch == 1,
    or smooth per-step interpolation otherwise."""

    warmup_steps = warmup_epochs * steps_per_epoch
    total_steps = epochs * steps_per_epoch

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * (step + 1) / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = min_lr + 0.5 * (lr - min_lr) * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule
