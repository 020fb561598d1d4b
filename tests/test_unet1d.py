"""Smoke test for the diffusion-policy ConditionalUnet1D ablation module."""

import jax
import jax.numpy as jnp
import numpy as np


def test_unet1d_shapes_and_grad():
    from diffusiondrive_tpu.models.conditional_unet1d import ConditionalUnet1D

    model = ConditionalUnet1D(input_dim=3, global_cond_dim=16, down_dims=(32, 64, 128))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 3)).astype(np.float32))
    t = jnp.array([5, 9])
    g = jnp.zeros((2, 16))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, g)
    out = jax.jit(model.apply)(variables, x, t, g)
    assert out.shape == (2, 8, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        return jnp.mean(model.apply(params, x, t, g) ** 2)

    grads = jax.jit(jax.grad(loss))(variables)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
