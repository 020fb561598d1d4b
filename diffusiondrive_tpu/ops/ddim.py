"""JAX DDIM scheduler (scaled-linear betas, sample prediction).

A ~100-line, fully jittable replacement for the HuggingFace `DDIMScheduler`
used by the reference trajectory head (`transfuser_model_v2.py:447-451`):
``DDIMScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear",
prediction_type="sample")`` with the diffusers defaults ``beta_start=1e-4``,
``beta_end=0.02``, ``clip_sample=True``, ``set_alpha_to_one=True``, ``eta=0``.

All schedule constants are precomputed host-side; `add_noise` / `step` are
pure functions of arrays + integer timesteps, so the whole truncated-diffusion
rollout stays inside one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    """Immutable DDIM schedule; safe to close over in jitted functions."""

    num_train_timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "sample"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = True

    # Precomputed tables (filled in __post_init__).
    alphas_cumprod: np.ndarray = dataclasses.field(init=False, repr=False, default=None)
    final_alpha_cumprod: float = dataclasses.field(init=False, repr=False, default=1.0)

    def __post_init__(self):
        if self.beta_schedule == "scaled_linear":
            betas = (
                np.linspace(
                    self.beta_start**0.5, self.beta_end**0.5, self.num_train_timesteps, dtype=np.float64
                )
                ** 2
            )
        elif self.beta_schedule == "linear":
            betas = np.linspace(self.beta_start, self.beta_end, self.num_train_timesteps, dtype=np.float64)
        else:
            raise ValueError(f"Unsupported beta schedule: {self.beta_schedule}")
        alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
        object.__setattr__(self, "alphas_cumprod", alphas_cumprod)
        object.__setattr__(
            self,
            "final_alpha_cumprod",
            1.0 if self.set_alpha_to_one else float(alphas_cumprod[0]),
        )

    # ------------------------------------------------------------------ #

    def add_noise(self, original_samples: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0): sqrt(a_t) x_0 + sqrt(1 - a_t) eps.

        `timesteps` is an int array broadcastable against the batch dim.
        """
        table = jnp.asarray(self.alphas_cumprod)
        a_t = table[timesteps]
        a_t = a_t.reshape(a_t.shape + (1,) * (original_samples.ndim - a_t.ndim))
        return jnp.sqrt(a_t) * original_samples + jnp.sqrt(1.0 - a_t) * noise

    def step(
        self,
        model_output: jnp.ndarray,
        timestep,
        sample: jnp.ndarray,
        num_inference_steps: int = 1000,
    ) -> jnp.ndarray:
        """One deterministic (eta=0) DDIM update; returns prev_sample.

        With `set_timesteps(num_train_timesteps)` the reference uses a step
        ratio of 1, i.e. prev_timestep = timestep - 1
        (`transfuser_model_v2.py:584,634`).
        """
        table = jnp.asarray(self.alphas_cumprod)
        step_ratio = self.num_train_timesteps // num_inference_steps
        t = jnp.asarray(timestep, dtype=jnp.int32)
        prev_t = t - step_ratio

        alpha_prod_t = table[t]
        alpha_prod_t_prev = jnp.where(
            prev_t >= 0, table[jnp.maximum(prev_t, 0)], jnp.float32(self.final_alpha_cumprod)
        )
        beta_prod_t = 1.0 - alpha_prod_t

        if self.prediction_type == "sample":
            pred_original_sample = model_output
        elif self.prediction_type == "epsilon":
            pred_original_sample = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(alpha_prod_t)
        else:
            raise ValueError(f"Unsupported prediction type: {self.prediction_type}")

        if self.clip_sample:
            pred_original_sample = jnp.clip(
                pred_original_sample, -self.clip_sample_range, self.clip_sample_range
            )

        pred_epsilon = (sample - jnp.sqrt(alpha_prod_t) * pred_original_sample) / jnp.sqrt(beta_prod_t)
        pred_sample_direction = jnp.sqrt(1.0 - alpha_prod_t_prev) * pred_epsilon
        return jnp.sqrt(alpha_prod_t_prev) * pred_original_sample + pred_sample_direction

    def rollout_timesteps(self, num_inference_steps: int) -> Tuple[int, ...]:
        """Standard (non-truncated) DDIM schedule: diffusers ``set_timesteps``
        with "leading" spacing — descending ``arange(n) * (T // n)``, e.g.
        (950, 900, ..., 50, 0) for 20 steps. This is the vanilla
        diffusion-policy rollout the truncated 2-step schedule is ablated
        against (`README.md:36`: "10x reduction in denoising steps")."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        return tuple(int(t) for t in ts)

    def truncated_rollout_timesteps(self, num_steps: int = 2, span: int = 20) -> Tuple[int, ...]:
        """The reference's truncated test-time schedule: descending timesteps
        ``(arange(num_steps) * span/num_steps).round()[::-1]``
        (`transfuser_model_v2.py:585-587`), e.g. (10, 0) for 2 steps.
        """
        ratio = span / num_steps
        ts = np.round(np.arange(num_steps) * ratio)[::-1].astype(np.int64)
        return tuple(int(t) for t in ts)
