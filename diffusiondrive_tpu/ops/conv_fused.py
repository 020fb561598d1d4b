"""Fused 3x3/64-channel conv Pallas kernel for the ResNet layer-1 hot path.

Why: 64 output channels fill half the 128 MXU lanes, capping any plain
im2col formulation at 50% MFU — XLA's conv emitter reaches ~28% on layer1
(`docs/profiling.md`), making the six 3x3/64ch convs ~17% of the whole
planner forward. This kernel packs **two adjacent output pixels into one
128-wide lane row**, lifting the ceiling to 75%:

    A row r = [x[2r-1], x[2r], x[2r+1], x[2r+2]]   (4 px x 64 ch = 768)
    B (768, 128): even-output taps in lanes 0:64, odd-output in 64:128

and decomposes the matmul into 6 partial (M,128)@(128,128) dots (one per
(dy, pair-shift)), so every MXU operand is a full native tile. Measured in
isolation on v5e: 136 us/conv vs 350 us for XLA's conv — ~72% effective MFU.

I/O stays plain NHWC: an XLA-side pad+reshape to the packed layout costs
more than the kernel itself (~280 us of copies), so the packed+padded
representation is built once per image in VMEM scratch. Eval-mode BatchNorm
is an exact per-channel affine, so the kernel also fuses the folded
scale/bias, the block's residual add, and the ReLU — at eval time an entire
BasicBlock (`models/resnet.py`) becomes two kernel launches with zero
XLA-side elementwise passes.

The public entry is wrapped in `custom_partitioning` (batch-dim rule) so the
sharded batched-eval program (`evaluate/pdm_score.py`) partitions it over
the mesh `data` axis instead of replicating a Mosaic custom call.

Parity: replaces the layer-1 portion of the timm ResNet-34 forward used by
`transfuser_backbone.py:24-55`; torch-twin parity is kept by the standard
(non-fused) path, and the fused path is differential-tested against it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from diffusiondrive_tpu.ops.batch_partition import batch_partitioned


def pack_conv3x3_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,64,64) HWIO -> (768,128). Row block k = dy*2+s holds the two
    window taps (j = 2s, 2s+1) of the 4-tap padded window; lanes 0:64 serve
    the even output pixel (taps j=0..2), lanes 64:128 the odd (taps 1..3)."""
    wb = jnp.zeros((3, 4, 64, 128), w.dtype)
    wb = wb.at[:, :3, :, :64].set(w)
    wb = wb.at[:, 1:, :, 64:].set(w)
    return wb.reshape(3, 2, 128, 128).reshape(768, 128)


def _kernel(x_ref, b_ref, sb_ref, *rest, h_chunk: int,
            relu: bool, residual: bool):
    """One grid step = one image. x_ref/r_ref/o_ref: (1, H, P, 128) — NHWC
    bit-viewed as width-pairs (P = W//2). pp_ref: (H+2, P+1, 128) scratch in
    the packed+padded layout pp[r] = (x[2r-1], x[2r]). The residual operand
    exists only when `residual` — a dummy would still be DMA'd HBM->VMEM
    every grid step (a full extra copy of the input's footprint)."""
    if residual:
        r_ref, o_ref, pp_ref = rest
    else:
        o_ref, pp_ref = rest
    H, P = x_ref.shape[1], x_ref.shape[2]
    f32 = jnp.float32

    # build the packed scratch once per image: one sublane shift + lane mix
    x2 = x_ref[0]                                             # (H, P, 128)
    zrow = jnp.zeros((H, 1, 128), x2.dtype)
    xl = jnp.concatenate([zrow, x2], axis=1)[:, :P + 1, :]    # x2[r-1]
    xr = jnp.concatenate([x2, zrow], axis=1)                  # x2[r]
    pp_ref[1:H + 1, :, :] = jnp.concatenate(
        [xl[:, :, 64:128], xr[:, :, 0:64]], axis=2)
    pp_ref[0, :, :] = jnp.zeros((P + 1, 128), x2.dtype)
    pp_ref[H + 1, :, :] = jnp.zeros((P + 1, 128), x2.dtype)

    scale = sb_ref[0:1, :].astype(f32)                        # (1, 128)
    bias = sb_ref[1:2, :].astype(f32)

    for hb in range(H // h_chunk):
        acc = None
        for dy in range(3):
            rows = pp_ref[pl.ds(hb * h_chunk + dy, h_chunk), :, :]
            for s in range(2):
                piece = rows[:, s:s + P, :].reshape(h_chunk * P, 128)
                bk = b_ref[(dy * 2 + s) * 128:(dy * 2 + s + 1) * 128, :]
                d = jax.lax.dot_general(piece, bk, (((1,), (0,)), ((), ())),
                                        preferred_element_type=f32)
                acc = d if acc is None else acc + d
        acc = acc * scale + bias
        if residual:
            res = r_ref[0, pl.ds(hb * h_chunk, h_chunk), :, :]
            acc = acc + res.reshape(h_chunk * P, 128).astype(f32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        o_ref[0, pl.ds(hb * h_chunk, h_chunk), :, :] = (
            acc.reshape(h_chunk, P, 128).astype(o_ref.dtype))


def _pick_h_chunk(h: int) -> int:
    for c in (16, 8, 4, 2, 1):
        if h % c == 0:
            return c
    return 1


def _fused_conv3x3_pallas(x2, bmat, sb, res2=None, *, relu: bool,
                          residual: bool, interpret: bool = False):
    B, H, P, _ = x2.shape
    # Mosaic kernels only compile for TPU; fall back to interpret mode off-TPU
    # so the sharded entry point stays executable (and testable) on CPU meshes
    interpret = interpret or jax.default_backend() != "tpu"
    data_spec = pl.BlockSpec((1, H, P, 128), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        data_spec,
        pl.BlockSpec((768, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = (x2, bmat, sb)
    if residual:
        in_specs.append(data_spec)
        operands += (res2,)
    return pl.pallas_call(
        functools.partial(_kernel, h_chunk=_pick_h_chunk(H), relu=relu,
                          residual=residual),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, P, 128), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, P, 128), x2.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, P + 1, 128), x2.dtype)],
        interpret=interpret,
    )(*operands)


_fused_conv3x3_sharded = batch_partitioned(
    lambda x2, bmat, sb, res2, relu: _fused_conv3x3_pallas(
        x2, bmat, sb, res2, relu=relu, residual=True),
    batched=(0, 3), ndims=(4, 2, 2, 4), out_ndim=4,
    rule="b h w c, k n, s t, b h w c -> b h w c", static_argnums=(4,))

_fused_conv3x3_sharded_nores = batch_partitioned(
    lambda x2, bmat, sb, relu: _fused_conv3x3_pallas(
        x2, bmat, sb, relu=relu, residual=False),
    batched=(0,), ndims=(4, 2, 2), out_ndim=4,
    rule="b h w c, k n, s t -> b h w c", static_argnums=(3,))


def supports_fused_conv3x3(x: jnp.ndarray, features: int, stride: int) -> bool:
    """Shape/size eligibility for the fused kernel (64ch, 3x3, stride 1)."""
    if x.ndim != 4 or x.shape[-1] != 64 or features != 64 or stride != 1:
        return False
    _, H, W, _ = x.shape
    return W % 2 == 0 and H >= 1 and W >= 2


def pack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC (B,H,W,64) -> width-paired (B,H,W//2,128).

    On TPU this reshape is a real relayout copy (~70 us on the layer-1
    activation), NOT a bitcast — the 64-lane layout is tiled differently —
    so callers chain as many packed convs as possible between one
    `pack_pairs`/`unpack_pairs` round trip (a whole ResNet stage)."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def unpack_pairs(x2: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `pack_pairs`."""
    B, H, P, C2 = x2.shape
    return x2.reshape(B, H, P * 2, C2 // 2)


def fused_conv3x3_packed(
    x2: jnp.ndarray,
    w: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    residual2: Optional[jnp.ndarray] = None,
    relu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Width-paired (B,H,P,128) stride-1 pad-1 3x3/64ch conv with optional
    fused per-channel affine (folded eval-mode BatchNorm), residual add and
    ReLU. `interpret=True` runs the kernel in interpret mode (CPU tests)."""
    if scale is None:
        scale = jnp.ones((64,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((64,), jnp.float32)
    sb = jnp.stack([jnp.tile(scale.astype(jnp.float32), 2),
                    jnp.tile(bias.astype(jnp.float32), 2)])  # (2,128) f32
    has_res = residual2 is not None
    bmat = pack_conv3x3_weights(w.astype(x2.dtype))
    if interpret:
        return _fused_conv3x3_pallas(x2, bmat, sb, residual2, relu=relu,
                                     residual=has_res, interpret=True)
    if has_res:
        return _fused_conv3x3_sharded(x2, bmat, sb, residual2, relu)
    return _fused_conv3x3_sharded_nores(x2, bmat, sb, relu)


def fused_conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    residual: Optional[jnp.ndarray] = None,
    relu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """NHWC wrapper around `fused_conv3x3_packed` (one pack/unpack pair)."""
    assert supports_fused_conv3x3(x, w.shape[-1], 1)
    res2 = pack_pairs(residual) if residual is not None else None
    out = fused_conv3x3_packed(pack_pairs(x), w, scale, bias, res2,
                               relu=relu, interpret=interpret)
    return unpack_pairs(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_train(x: jnp.ndarray, w: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Differentiable stride-1 pad-1 3x3/64ch conv on the Pallas MXU kernel.

    The eval path folds BatchNorm into the kernel's affine, which train-mode
    BN (live batch stats between conv and ReLU) forbids — so training fell
    back to XLA's ~28%-MFU conv emitter for the forward AND the whole
    backward (docs/profiling.md round 5). This wrapper keeps the bare conv on
    the packed Pallas kernel in both directions:

      - forward: the fused kernel with an identity affine (scale 1, bias 0,
        no ReLU/residual) — BN/ReLU stay in XLA where they fuse for free;
      - input gradient: for stride-1 pad-1 the cotangent conv is *exactly
        another stride-1 pad-1 3x3 conv* with spatially flipped,
        in/out-transposed weights, so it reuses the same kernel;
      - weight gradient: XLA's native wgrad (via `jax.vjp` of the plain
        conv) — a reduction-heavy (576, B*H*W) @ (B*H*W, 64) contraction the
        MXU handles well, and XLA reads x/g exactly once.

    MEASURED AND REJECTED as the default train path (round 5, b64 on v5e):
    the kernel wins 3x in isolation (0.44 vs 1.4 ms/conv, ~70% vs ~28% MFU)
    but the full train step went 182 -> 239 ms device — every elementwise op
    fused across the packed<->NHWC reshape at the custom-call boundary runs
    at ~1/8 bandwidth (per-block ReLU 4-5 ms, BN casts 2-3 ms, backward
    repacks 3.1 ms; A/B + microbench in docs/profiling.md). Kept behind
    `fused_mode="train"` / "interpret" with gradient parity pinned in
    `tests/test_conv_fused.py`; the eval path is unaffected (BN folds into
    the kernel there, so no boundary elementwise exists).

    Replaces the layer-1 training portion of the timm ResNet-34 forward used
    by `transfuser_backbone.py:24-55`.
    """
    return _conv3x3_train_fwd(x, w, interpret)[0]


def _conv3x3_plain(x: jnp.ndarray, w: jnp.ndarray,
                   interpret: bool) -> jnp.ndarray:
    assert supports_fused_conv3x3(x, w.shape[-1], 1)
    out = fused_conv3x3_packed(pack_pairs(x), w, relu=False,
                               interpret=interpret)
    return unpack_pairs(out)


def _conv3x3_train_fwd(x, w, interpret):
    return _conv3x3_plain(x, w, interpret), (x, w)


def _conv3x3_train_bwd(interpret, res, g):
    x, w = res
    # dgrad: dx[b,h,v,i] = sum g[b,h-dy+1,v-dx+1,o] w[dy,dx,i,o]
    #      = conv3x3_pad1(g, w') with w'[a,b,o,i] = w[2-a,2-b,i,o]
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv3x3_plain(g, w_flip, interpret)
    # wgrad: XLA's fused conv-transpose kernel (single pass over x and g)
    conv_w = lambda w_: jax.lax.conv_general_dilated(
        x, w_, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dw = jax.vjp(conv_w, w)[1](g)[0]
    return dx, dw


conv3x3_train.defvjp(_conv3x3_train_fwd, _conv3x3_train_bwd)


def pack_stem_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(7,7,C,F) HWIO stem kernel -> (7,3,4C,2F) width-grouped/pair-packed.

    Reformulates the stride-2 7x7 stem conv as a stride-(2,1) conv over
    width-grouped-by-4 input (a contiguous, therefore free, reshape of NHWC):
    group g holds pixels 4g..4g+3 (4C channels), and each output "pair"
    position p emits the two adjacent output pixels (2p, 2p+1) in the channel
    dim (lanes 0:F even, F:2F odd). Output pixel 2p+s reads input pixel
    4(p+q')+r = 2(2p+s)+dx-3, so tap dx of the original kernel lands at
    (q=q'+1, channel r*C+ch, lane s*F+co) with dx = 4(q-1)+r-2s+3.

    MEASURED AND REJECTED as an XLA-path stem (round 4): although both
    reshapes are contiguous in logical order, XLA:TPU's tiled physical
    layouts make them real relayout copies — the image stem went 2.34 ->
    4.43 ms/launch at b16 when wired into `ResNetStem`. Kept as the exact
    numerics reference for the Pallas stem kernel, whose weight packing
    reuses this (dy, q, r*C+ch, s*F+co) indexing.
    """
    K, K2, C, F = w.shape
    assert K == 7 and K2 == 7
    out = jnp.zeros((7, 3, 4 * C, 2 * F), w.dtype)
    for q in range(3):
        for r in range(4):
            for s in range(2):
                dx = 4 * (q - 1) + r - 2 * s + 3
                if 0 <= dx < 7:
                    out = out.at[:, q, r * C:(r + 1) * C, s * F:(s + 1) * F].set(w[:, dx])
    return out


def stem_conv7x7s2_grouped(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """7x7 stride-2 pad-3 NHWC conv via the width-grouped formulation.

    Exact reformulation of ``lax.conv_general_dilated(x, w, (2, 2),
    ((3, 3), (3, 3)))`` for any input channel count (camera C=3, lidar BEV
    histograms); requires W % 4 == 0. See `pack_stem_weights` for why.
    """
    B, H, W, C = x.shape
    assert W % 4 == 0, W
    xg = x.reshape(B, H, W // 4, 4 * C)
    wg = pack_stem_weights(w.astype(x.dtype))
    y = jax.lax.conv_general_dilated(
        xg, wg, window_strides=(2, 1), padding=((3, 3), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    Bo, Ho, P, F2 = y.shape
    return y.reshape(Bo, Ho, P * 2, F2 // 2)


def bn_eval_affine(bn_apply, channels: int, dtype) -> tuple:
    """Exact f32 (scale, bias) of an eval-mode BatchNorm.

    Calls the module once (creating/binding its params during init), then
    folds the affine directly from its variables in f32. Folding from the
    parameter tree — rather than differencing two probe evaluations — matters
    in bf16: ``bn(1) - bn(0)`` cancels catastrophically when |bias| >> |scale|
    (bf16 spacing at the bias magnitude can exceed the scale itself), which
    would make the fused path silently diverge from the BN it replaces."""
    shape = (1, 1, 1, channels)
    probe = bn_apply(jnp.zeros(shape, dtype)).reshape(channels)
    v = bn_apply.variables
    if "batch_stats" in v:
        f32 = jnp.float32
        stats, params = v["batch_stats"], v.get("params", {})
        gamma = params.get("scale", jnp.ones((channels,), f32)).astype(f32)
        beta = params.get("bias", jnp.zeros((channels,), f32)).astype(f32)
        s = gamma * jax.lax.rsqrt(stats["var"].astype(f32) + bn_apply.epsilon)
        b = beta - stats["mean"].astype(f32) * s
        return s, b
    # Non-BatchNorm affine layer: fall back to probe differencing with a
    # large probe so the subtraction is conditioned (K·scale >> bias).
    # Probing runs at module dtype, so this path is only exact for f32
    # modules — a bf16 module would carry ~0.4% relative scale error, which
    # would silently break the exactness contract above.
    assert jnp.dtype(dtype) == jnp.float32, (
        f"bn_eval_affine probe-differencing fallback requires an f32 module, got {dtype}"
    )
    k = jnp.asarray(4096.0, dtype)
    b = probe.astype(jnp.float32)
    s = (bn_apply(jnp.full(shape, k, dtype)).reshape(channels).astype(jnp.float32) - b) / 4096.0
    return s, b


def maxpool3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-2/pad-1 max pool as a 9-way shifted-slice max.

    MEASURED AND REJECTED as the stem pool (round 4): on v5e the nine
    stride-2 slices do NOT fuse — they materialize and cost 1.44 ms at b1
    (vs 0.49 ms for `nn.max_pool`'s reduce_window at b16, profile in
    docs/profiling.md). Kept as the numerics reference / CPU alternative;
    identical semantics to `nn.max_pool` (pad = -inf)."""
    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    out = None
    for dy in range(3):
        for dx in range(3):
            v = jax.lax.slice(
                xp, (0, dy, dx, 0), (B, dy + 2 * Ho, dx + 2 * Wo, C), (1, 2, 2, 1))
            out = v if out is None else jnp.maximum(out, v)
    return out
