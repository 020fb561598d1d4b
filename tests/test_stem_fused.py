"""Fused Pallas ResNet-stem kernel vs the plain XLA stem.

The kernel fuses conv7x7/s2 + folded eval-BatchNorm + ReLU + maxpool3x3/s2
(`ops/stem_fused.py`) — the stem of the timm encoders used by
`transfuser_backbone.py:24-55`. Parity must hold for any channel count with
4C <= 16 (camera C=3, BEV histogram C<=4) including the zero-padded edges,
and the batch-sharded entry must equal the unsharded result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from diffusiondrive_tpu.models.resnet import ResNetStem
from diffusiondrive_tpu.ops.stem_fused import (
    fused_stem,
    pack_stem_weights_planar,
    supports_fused_stem,
    to_planar,
)


def _stem_ref(x, w, scale, bias):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y * scale + bias, 0.0).astype(x.dtype)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("B,H,W,C", [(2, 64, 512, 3), (1, 128, 512, 4),
                                     (1, 64, 1024, 1)])
def test_fused_stem_matches_xla(B, H, W, C):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 7, C, 64)).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.uniform(0.5, 2.0, 64).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.1)
    assert supports_fused_stem(x)
    got = fused_stem(x, w, sc, bi, interpret=True)
    want = _stem_ref(x, w, sc, bi)
    assert got.shape == (B, H // 4, W // 4, 64) == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_stem_pool_pad_equivalence():
    """Strongly negative bias drives whole regions to ReLU zero: the kernel's
    zero-fill pool padding must still match reduce_window's -inf padding at
    the top/bottom/left/right edges."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 512, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)
    sc = jnp.ones((64,), jnp.float32)
    bi = jnp.full((64,), -2.0, jnp.float32)
    got = fused_stem(x, w, sc, bi, interpret=True)
    want = _stem_ref(x, w, sc, bi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_stem_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 64, 512, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.bfloat16)
    sc = jnp.asarray(rng.uniform(0.5, 2.0, 64).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.1)
    got = np.asarray(fused_stem(x, w, sc, bi, interpret=True), np.float32)
    want = np.asarray(_stem_ref(x, w, sc.astype(jnp.bfloat16),
                                bi.astype(jnp.bfloat16)), np.float32)
    # bf16 rounds at different points (the kernel keeps the affine in f32);
    # tolerance is a few bf16 eps of the activation scale
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_supports_fused_stem_eligibility():
    ok = jnp.zeros((1, 64, 512, 3))
    assert supports_fused_stem(ok)
    assert not supports_fused_stem(jnp.zeros((1, 64, 512, 5)))   # 4C > 16
    assert not supports_fused_stem(jnp.zeros((1, 64, 256, 3)))   # G=64 lanes
    assert not supports_fused_stem(jnp.zeros((1, 48, 512, 3)))   # H % 64
    assert not supports_fused_stem(jnp.zeros((64, 512, 3)))      # rank


def test_to_planar_indexing():
    B, H, W, C = 1, 2, 16, 3
    x = jnp.arange(B * H * W * C, dtype=jnp.float32).reshape(B, H, W, C)
    p = to_planar(x)
    assert p.shape == (B, H, 4 * C, W // 4)
    for g in range(W // 4):
        for r in range(4):
            for c in range(C):
                assert p[0, 1, r * C + c, g] == x[0, 1, 4 * g + r, c]


def test_pack_stem_weights_planar_layout():
    """Every original tap appears exactly twice (once per output parity) and
    all other columns are zero."""
    w = jnp.asarray(np.random.default_rng(3).normal(size=(7, 7, 3, 64)),
                    jnp.float32)
    wt = pack_stem_weights_planar(w)
    assert wt.shape == (128, 336)
    total = float(jnp.abs(wt).sum())
    per_tap = float(jnp.abs(w).sum())
    np.testing.assert_allclose(total, 2 * per_tap, rtol=1e-6)


def test_resnet_stem_module_fused_parity():
    """ResNetStem(fused_mode='interpret') == ResNetStem(fused_mode='off') on
    the same params, eval mode; train mode always takes the plain path."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 64, 512, 3)).astype(np.float32))
    stem_off = ResNetStem(fused_mode="off")
    stem_fused = ResNetStem(fused_mode="interpret")
    variables = stem_off.init(jax.random.PRNGKey(0), x)
    want = stem_off.apply(variables, x)
    got = stem_fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # param tree is identical (torch-port compatible: conv1/kernel + bn1)
    assert set(variables["params"].keys()) == {"conv1", "bn1"}
    assert variables["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)


def test_fused_stem_sharded_over_mesh():
    """custom_partitioning: batch-sharded fused stem == unsharded result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devices), ("data",))
    rng = np.random.default_rng(5)
    B = 2 * len(devices)
    x = jnp.asarray(rng.normal(size=(B, 64, 512, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.uniform(0.5, 2.0, 64).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.1)
    sharding = NamedSharding(mesh, P("data", None, None, None))
    f = jax.jit(lambda a: fused_stem(a, w, sc, bi),
                in_shardings=sharding, out_shardings=sharding)
    got = np.asarray(f(jax.device_put(x, sharding)))
    want = np.asarray(_stem_ref(x, w, sc, bi))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
