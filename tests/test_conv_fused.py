"""Fused 3x3/64ch conv kernel + shifted-slice maxpool vs XLA references.

The kernel replaces XLA's conv emitter on the ResNet layer-1 hot path
(`transfuser_backbone.py:24-55` territory); eval-mode BatchNorm folding must
be exact, and the packed-layout chaining must match the standard block math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondrive_tpu.models.resnet import BasicBlock, ResNetStage
from diffusiondrive_tpu.ops.conv_fused import (
    bn_eval_affine,
    fused_conv3x3,
    fused_conv3x3_packed,
    maxpool3x3s2,
    pack_pairs,
    supports_fused_conv3x3,
    unpack_pairs,
)


def _conv_ref(x, w, scale=None, bias=None, residual=None, relu=False):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if scale is not None:
        y = y * scale + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@pytest.mark.parametrize("B,H,W", [(2, 16, 32), (1, 8, 64), (3, 4, 6)])
def test_fused_conv_matches_xla(B, H, W):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 64)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.2)
    got = fused_conv3x3(x, w, interpret=True)
    want = _conv_ref(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_conv_affine_residual_relu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 32, 64)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.2)
    sc = jnp.asarray(rng.uniform(0.5, 2.0, 64).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=64).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(2, 8, 32, 64)).astype(np.float32))
    got = fused_conv3x3(x, w, sc, bi, residual=res, relu=True, interpret=True)
    want = _conv_ref(x, w, sc, bi, residual=res, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_roundtrip_and_supports():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 64)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_pairs(pack_pairs(x))), np.asarray(x))
    assert supports_fused_conv3x3(x, 64, 1)
    assert not supports_fused_conv3x3(x, 128, 1)      # channel change
    assert not supports_fused_conv3x3(x, 64, 2)       # stride
    assert not supports_fused_conv3x3(x[..., :32], 64, 1)  # 32 in-channels
    odd = jnp.zeros((1, 4, 7, 64))
    assert not supports_fused_conv3x3(odd, 64, 1)     # odd width


def test_packed_chain_matches_two_convs():
    """Chaining packed convs (the whole-stage path) == two NHWC convs."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 64)).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.2)
    x2 = pack_pairs(x)
    y2 = fused_conv3x3_packed(x2, w1, relu=True, interpret=True)
    out = unpack_pairs(fused_conv3x3_packed(y2, w2, residual2=x2, interpret=True))
    want = _conv_ref(_conv_ref(x, w1, relu=True), w2, residual=x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_maxpool_matches_nn_max_pool():
    import flax.linen as nn

    rng = np.random.default_rng(4)
    # include large negatives so the -inf padding semantics are exercised
    x = jnp.asarray(rng.normal(size=(2, 16, 32, 8)).astype(np.float32) * 10 - 5)
    got = maxpool3x3s2(x)
    want = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bn_eval_affine_exact():
    import flax.linen as nn

    bn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 4, 4, 16)).astype(np.float32))
    v = bn.init(jax.random.PRNGKey(0), x)
    v = {"params": v["params"],
         "batch_stats": jax.tree_util.tree_map(lambda a: a + 0.37, v["batch_stats"])}
    bound = bn.bind(v)
    s, b = bn_eval_affine(bound, 16, jnp.float32)
    want = bn.apply(v, x)
    np.testing.assert_allclose(np.asarray(x * s + b), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_bn_eval_affine_bf16_no_cancellation():
    """The folded affine must be exact even when the module computes in bf16
    and |bias| >> |scale| — probe differencing (bn(1)-bn(0)) cancels
    catastrophically there (bf16 spacing at the bias magnitude exceeds the
    scale), which silently skewed every fused-path channel on TPU eval."""
    import flax.linen as nn

    C = 8
    bn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.bfloat16)
    x = jnp.zeros((1, 1, 1, C), jnp.bfloat16)
    v = bn.init(jax.random.PRNGKey(0), x)
    # folded scale ~0.01, folded bias ~ -mean*scale + beta: |bias|/|scale| huge
    v = {"params": {"scale": jnp.full((C,), 1.0), "bias": jnp.full((C,), 4.0)},
         "batch_stats": {"mean": jnp.full((C,), 40.0), "var": jnp.full((C,), 1e4)}}
    s, b = bn_eval_affine(bn.bind(v), C, jnp.bfloat16)
    want_s = 1.0 / np.sqrt(1e4 + 1e-5)
    np.testing.assert_allclose(np.asarray(s), want_s, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b), 4.0 - 40.0 * want_s, rtol=1e-5)
    assert s.dtype == jnp.float32 and b.dtype == jnp.float32


def test_basic_block_fused_parity():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 64)).astype(np.float32) * 0.5)
    blk_std = BasicBlock(64, fused_mode="off")
    blk_fused = BasicBlock(64, fused_mode="interpret")
    v = blk_std.init(jax.random.PRNGKey(0), x, train=False)
    v = {"params": v["params"],
         "batch_stats": jax.tree_util.tree_map(lambda a: a + 0.3, v["batch_stats"])}
    y_std = blk_std.apply(v, x, train=False)
    y_fused = blk_fused.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_std), rtol=1e-4, atol=1e-5)


def test_stage_fused_parity_and_tree():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 64)).astype(np.float32) * 0.5)
    st_off = ResNetStage(64, 3, stride=1, fused_mode="off")
    st_fused = ResNetStage(64, 3, stride=1, fused_mode="interpret")
    v = st_off.init(jax.random.PRNGKey(0), x, train=False)
    v = {"params": v["params"],
         "batch_stats": jax.tree_util.tree_map(lambda a: a + 0.25, v["batch_stats"])}
    y0 = st_off.apply(v, x, train=False)
    y1 = st_fused.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-5)
    # init through the fused path must create the identical variable tree
    v2 = st_fused.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v2["params"])
            == jax.tree_util.tree_structure(v["params"]))


def test_conv3x3_train_value_and_grads():
    """custom-VJP train conv: value, input grad (Pallas flipped-weight conv)
    and weight grad (XLA wgrad) all match differentiating the XLA conv."""
    from diffusiondrive_tpu.ops.conv_fused import conv3x3_train

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 64)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.2)
    # non-trivial cotangent so dgrad/wgrad see an asymmetric g
    ct = jnp.asarray(rng.normal(size=(2, 8, 16, 64)).astype(np.float32))

    def loss_pallas(x_, w_):
        return jnp.sum(conv3x3_train(x_, w_, True) * ct)

    def loss_xla(x_, w_):
        return jnp.sum(_conv_ref(x_, w_) * ct)

    np.testing.assert_allclose(
        np.asarray(conv3x3_train(x, w, True)), np.asarray(_conv_ref(x, w)),
        rtol=1e-5, atol=1e-5)
    dx_p, dw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    dx_x, dw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_x), rtol=1e-4, atol=1e-4)


def test_basic_block_train_path_parity():
    """BasicBlock train forward, param/input grads, and batch_stats updates
    are identical between the Pallas train path and the plain XLA path."""
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 64)).astype(np.float32) * 0.5)
    ct = jnp.asarray(rng.normal(size=(2, 8, 16, 64)).astype(np.float32))
    blk_std = BasicBlock(64, fused_mode="off")
    blk_pal = BasicBlock(64, fused_mode="interpret")
    v = blk_std.init(jax.random.PRNGKey(0), x, train=True)

    def run(blk):
        def loss(params, x_):
            y, mut = blk.apply({"params": params, "batch_stats": v["batch_stats"]},
                               x_, train=True, mutable=["batch_stats"])
            return jnp.sum(y * ct), (y, mut)
        (val, (y, mut)), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                                    has_aux=True)(v["params"], x)
        return val, y, mut, grads

    val_s, y_s, mut_s, (gp_s, gx_s) = run(blk_std)
    val_p, y_p, mut_p, (gp_p, gx_p) = run(blk_pal)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(val_p), float(val_s), rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        (mut_p, gp_p, gx_p), (mut_s, gp_s, gx_s))


def test_conv3x3_train_grad_sharded_over_mesh():
    """Batch-sharded grads through the train conv == unsharded grads (the
    custom-VJP's fwd and dgrad both cross the custom_partitioning rule)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from diffusiondrive_tpu.ops.conv_fused import conv3x3_train

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devices), ("data",))
    rng = np.random.default_rng(11)
    B = 2 * len(devices)
    x = jnp.asarray(rng.normal(size=(B, 8, 16, 64)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.2)

    def loss(x_, w_):
        return jnp.sum(conv3x3_train(x_, w_) ** 2)

    sharding = NamedSharding(mesh, P("data", None, None, None))
    g = jax.jit(jax.grad(loss, argnums=(0, 1)), in_shardings=(sharding, None))
    dx_sh, dw_sh = g(jax.device_put(x, sharding), w)
    dx_1, dw_1 = jax.grad(loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_sh), np.asarray(dx_1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_sh), np.asarray(dw_1), rtol=1e-4, atol=1e-4)


def test_fused_conv_sharded_over_mesh():
    """custom_partitioning: batch-sharded packed conv == unsharded result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devices), ("data",))
    rng = np.random.default_rng(8)
    B = 2 * len(devices)
    x = jnp.asarray(rng.normal(size=(B, 8, 16, 64)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.2)
    x2 = pack_pairs(x)
    sharding = NamedSharding(mesh, P("data", None, None, None))
    f = jax.jit(lambda a: fused_conv3x3_packed(a, w, relu=True),
                in_shardings=sharding, out_shardings=sharding)
    got = np.asarray(unpack_pairs(f(jax.device_put(x2, sharding))))
    want = np.asarray(_conv_ref(x, w, relu=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
