"""Golden tests of the core JAX ops against torch (CPU) references."""

import math

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from diffusiondrive_tpu.ops.ddim import DDIMScheduler
from diffusiondrive_tpu.ops.embed import gen_sineembed_for_position, sinusoidal_pos_emb
from diffusiondrive_tpu.ops.sampling import adaptive_avg_pool2d, grid_sample_2d, resize_bilinear


# --------------------------------------------------------------------------- #
# torch reference ports (behavioral spec of blocks.py / conditional_unet1d.py)
# --------------------------------------------------------------------------- #


def torch_gen_sineembed(pos_tensor, hidden_dim=256):
    half_hidden_dim = hidden_dim // 2
    scale = 2 * math.pi
    dim_t = torch.arange(half_hidden_dim, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / half_hidden_dim)
    x_embed = pos_tensor[..., 0] * scale
    y_embed = pos_tensor[..., 1] * scale
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=-1).flatten(-2)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=-1).flatten(-2)
    return torch.cat((pos_y, pos_x), dim=-1)


def torch_sinusoidal_pos_emb(x, dim):
    half_dim = dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = torch.exp(torch.arange(half_dim) * -emb)
    emb = x[:, None] * emb[None, :]
    return torch.cat((emb.sin(), emb.cos()), dim=-1)


def test_gen_sineembed_matches_torch():
    rng = np.random.default_rng(1)
    pos = rng.uniform(-30, 30, size=(2, 20, 8, 2)).astype(np.float32)
    ours = np.asarray(gen_sineembed_for_position(jnp.asarray(pos), hidden_dim=64))
    ref = torch_gen_sineembed(torch.from_numpy(pos), hidden_dim=64).numpy()
    # float32 pow/rounding differences get amplified by large phase args;
    # 2e-4 on a sin/cos output is well below any downstream significance.
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_sinusoidal_pos_emb_matches_torch():
    t = np.array([0, 8, 10, 49, 999], dtype=np.float32)
    ours = np.asarray(sinusoidal_pos_emb(jnp.asarray(t), 256))
    # float64 torch reference: our host-side float64 freq table is *more*
    # accurate than torch's float32 exp, so compare against the true values.
    ref = torch_sinusoidal_pos_emb(torch.from_numpy(t).double(), 256).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4)


# --------------------------------------------------------------------------- #
# grid sample / resize / pooling
# --------------------------------------------------------------------------- #


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(2)
    value = rng.normal(size=(2, 16, 24, 5)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(2, 7, 9, 2)).astype(np.float32)  # incl. out-of-bounds

    ours = np.asarray(grid_sample_2d(jnp.asarray(value), jnp.asarray(grid)))
    ref = (
        F.grid_sample(
            torch.from_numpy(value).permute(0, 3, 1, 2),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_bilinear_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (64, 64)))
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(64, 64), mode="bilinear", align_corners=False
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_adaptive_avg_pool_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 64, 256, 3)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (8, 32)))
    ref = (
        F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), (8, 32))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# --------------------------------------------------------------------------- #
# DDIM
# --------------------------------------------------------------------------- #


def _diffusers_tables(T=1000, beta_start=1e-4, beta_end=0.02):
    betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    return np.cumprod(1 - betas)


def test_ddim_add_noise():
    sched = DDIMScheduler()
    table = _diffusers_tables()
    rng = np.random.default_rng(5)
    x0 = rng.normal(size=(3, 20, 8, 2)).astype(np.float32)
    noise = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([8, 0, 49])

    ours = np.asarray(sched.add_noise(jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t)))
    a = table[t].reshape(-1, 1, 1, 1)
    ref = np.sqrt(a) * x0 + np.sqrt(1 - a) * noise
    np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-5)


def test_ddim_step_matches_manual():
    """DDIM step with sample-prediction, eta=0, clip_sample=True, step ratio 1."""
    sched = DDIMScheduler()
    table = _diffusers_tables()
    rng = np.random.default_rng(6)
    sample = rng.normal(size=(2, 20, 8, 2)).astype(np.float32)
    model_out = rng.normal(scale=1.5, size=sample.shape).astype(np.float32)  # exceeds clip range

    for t in (10, 0):
        ours = np.asarray(sched.step(jnp.asarray(model_out), t, jnp.asarray(sample)))
        a_t = table[t]
        a_prev = table[t - 1] if t - 1 >= 0 else 1.0
        x0 = np.clip(model_out, -1, 1)
        eps = (sample - math.sqrt(a_t) * x0) / math.sqrt(1 - a_t)
        ref = math.sqrt(a_prev) * x0 + math.sqrt(1 - a_prev) * eps
        np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-4)


def test_truncated_rollout_timesteps():
    sched = DDIMScheduler()
    assert sched.truncated_rollout_timesteps(2, 20) == (10, 0)
    assert sched.truncated_rollout_timesteps(20, 20) == tuple(range(19, -1, -1))
