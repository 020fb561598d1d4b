"""Fused self-attention kernel vs the XLA einsum reference.

The kernel is measured-and-rejected for the default path (it loses ~10-40%
to XLA's own fusion at the T=320 fusion-block shape; docs/profiling.md
round-5 A/B) but kept opt-in behind `fused_attention_mode="on"/"interpret"`
(`transfuser_backbone.py:365-409` territory), so its numerics — forward,
custom-VJP backward, the externally-drawn dropout mask, and the
multi-result `batch_partitioned` mesh rule — stay pinned here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondrive_tpu.models.backbone import GPTSelfAttention
from diffusiondrive_tpu.ops.attention_fused import (
    dropout_keep_mask,
    fused_attention,
    supports_fused_attention,
)

B, H, T, D = 3, 2, 24, 32


def _attn_ref(q, k, v, mask=None, pdrop=0.0):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(q.shape[-1])
    p = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        p = jnp.where(mask != 0, p / (1.0 - pdrop), jnp.zeros_like(p))
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def _qkv(seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
                 * scale for _ in range(3))


def test_forward_matches_reference():
    q, k, v = _qkv(0)
    got = fused_attention(q, k, v, None, 0.0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_attn_ref(q, k, v)),
                               rtol=1e-5, atol=1e-6)


def test_forward_with_dropout_mask():
    q, k, v = _qkv(1)
    pdrop = 0.25
    mask = dropout_keep_mask(jax.random.PRNGKey(7), (B, H, T, T), pdrop)
    got = fused_attention(q, k, v, mask, pdrop, True)
    want = _attn_ref(q, k, v, mask, pdrop)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # the mask actually drops: P(keep) ~ 0.75
    frac = float(jnp.mean(mask))
    assert 0.65 < frac < 0.85


def test_grads_match_reference():
    q, k, v = _qkv(2)
    pdrop = 0.2
    mask = dropout_keep_mask(jax.random.PRNGKey(3), (B, H, T, T), pdrop)
    ct = jnp.asarray(np.random.default_rng(4).normal(size=(B, H, T, D))
                     .astype(np.float32))

    def loss_fused(q_, k_, v_):
        return jnp.sum(fused_attention(q_, k_, v_, mask, pdrop, True) * ct)

    def loss_ref(q_, k_, v_):
        return jnp.sum(_attn_ref(q_, k_, v_, mask, pdrop) * ct)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_supports_eligibility():
    assert supports_fused_attention(320, 64)
    assert supports_fused_attention(8, 8)
    assert not supports_fused_attention(4, 64)      # T too small
    assert not supports_fused_attention(321, 64)    # T % 8
    assert not supports_fused_attention(1024, 64)   # (T, T) exceeds VMEM plan
    assert not supports_fused_attention(320, 4)     # d_head too small
    assert not supports_fused_attention(320, 512)   # d_head too large


def test_module_parity_deterministic():
    """GPTSelfAttention fused_mode='interpret' == 'off' in eval mode, and
    the two modes build the identical variable tree."""
    x = jnp.asarray(np.random.default_rng(5).normal(size=(B, T, H * D))
                    .astype(np.float32) * 0.5)
    kw = dict(n_embd=H * D, n_head=H, attn_pdrop=0.1, resid_pdrop=0.1)
    m_off = GPTSelfAttention(fused_mode="off", **kw)
    m_fused = GPTSelfAttention(fused_mode="interpret", **kw)
    v = m_off.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                m_fused.init(jax.random.PRNGKey(0), x)))
    y_off = m_off.apply(v, x, deterministic=True)
    y_fused = m_fused.apply(v, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_off),
                               rtol=1e-5, atol=1e-5)


def test_module_parity_train_no_attn_dropout():
    """With attn_pdrop=0 the train-mode paths share every RNG draw (only the
    residual nn.Dropout consumes 'dropout'), so fused == off exactly; with
    attn_pdrop>0 the fused path must actually consume the stream (different
    output than deterministic)."""
    x = jnp.asarray(np.random.default_rng(6).normal(size=(B, T, H * D))
                    .astype(np.float32) * 0.5)
    kw = dict(n_embd=H * D, n_head=H, resid_pdrop=0.3)
    rngs = {"dropout": jax.random.PRNGKey(11)}
    m_off = GPTSelfAttention(attn_pdrop=0.0, fused_mode="off", **kw)
    m_fused = GPTSelfAttention(attn_pdrop=0.0, fused_mode="interpret", **kw)
    v = m_off.init(jax.random.PRNGKey(0), x)
    y_off = m_off.apply(v, x, deterministic=False, rngs=rngs)
    y_fused = m_fused.apply(v, x, deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_off),
                               rtol=1e-5, atol=1e-5)

    m_drop = GPTSelfAttention(attn_pdrop=0.5, fused_mode="interpret", **kw)
    y_det = m_drop.apply(v, x, deterministic=True)
    y_drop = m_drop.apply(v, x, deterministic=False, rngs=rngs)
    assert not np.allclose(np.asarray(y_drop), np.asarray(y_det), atol=1e-3)


def test_sharded_over_mesh_matches_unsharded():
    """Batch-sharded fwd AND grads == unsharded (pins the single- and
    multi-result `batch_partitioned` rules the kernel ships on)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devices), ("data",))
    nb = 2 * len(devices)
    rng = np.random.default_rng(8)
    q, k, v = (jnp.asarray(rng.normal(size=(nb, H, T, D)).astype(np.float32))
               * 0.3 for _ in range(3))
    pdrop = 0.2
    mask = dropout_keep_mask(jax.random.PRNGKey(9), (nb, H, T, T), pdrop)

    def loss(q_, k_, v_):
        return jnp.sum(fused_attention(q_, k_, v_, mask, pdrop, True) ** 2)

    sh = NamedSharding(mesh, P("data", None, None, None))
    args = [jax.device_put(a, sh) for a in (q, k, v)]
    out_sh = np.asarray(jax.jit(
        lambda *a: fused_attention(*a, mask, pdrop, True),
        in_shardings=(sh, sh, sh))(*args))
    out_1 = np.asarray(fused_attention(q, k, v, mask, pdrop, True))
    np.testing.assert_allclose(out_sh, out_1, rtol=1e-5, atol=1e-6)

    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                   in_shardings=(sh, sh, sh))(*args)
    g_1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_sh, g_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
