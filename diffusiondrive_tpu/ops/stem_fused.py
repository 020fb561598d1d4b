"""Fused Pallas ResNet-stem kernel: conv7x7/s2 + BN affine + ReLU + maxpool3x3/s2.

Why: the 3-channel stem conv is the worst op in the planner forward — XLA's
emitter runs it at ~7% MFU (3 of 128 lanes live) and the maxpool's
reduce_window adds 0.5 ms; together the image stem is ~2.1 ms of a ~10.8 ms
b16 launch (docs/profiling.md). Every XLA-side data rearrangement that would
fix the lane utilisation (2x2 space-to-depth, width-grouping) costs more in
relayout copies than it saves — measured and rejected twice
(`conv_fused.py:stem_conv7x7s2_grouped`, docs/profiling.md round 3). So the
rearrangement happens *inside* the kernel, where VMEM shifts are free:

 - Input is the **planar** camera layout (B, H, 4C, W/4): channel
   rc = r*C + c holds pixel 4g+r of width-group g — lanes are width groups
   (dense 256 for the 1024-wide camera), sublanes are the 4C=12 grouped
   channels (padded to 16).
 - Per input row the kernel builds Z = [shift(x,-1); x; shift(x,+1)] with
   `pltpu.roll` lane rotations (48 sublanes), so each conv output row is ONE
   (128, 336) @ (336, 256) MXU dot: 336 = 7 dy x 48, N = 256 width-pairs,
   M = 128 = two adjacent output pixels x 64 channels (full native tiles).
 - The folded eval-BatchNorm affine + ReLU run on the f32 accumulator, and
   the 3x3/s2 maxpool consumes conv rows straight from VMEM scratch (ReLU
   makes zero-fill at edges equivalent to reduce_window's -inf padding).

Output is the planar pooled map (B, H/4, F, W/4); `ResNetStem` converts to
NHWC (or the width-paired layout `ops/conv_fused.py` chains through layer1)
with one XLA transpose of the 4x-downsampled map.

Replaces the stem of the timm ResNet-34 encoders used by
`transfuser_backbone.py:24-55` (conv1/bn1/maxpool); exact up to fp
associativity — differential-tested against the plain XLA path in
`tests/test_stem_fused.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from diffusiondrive_tpu.ops.batch_partition import batch_partitioned

_POOL_ROWS_PER_STEP = 16


def to_planar(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC (B,H,W,C) -> planar (B,H,4C,W/4): planar[b,h,r*C+c,g] = x[b,h,4g+r,c]."""
    B, H, W, C = x.shape
    assert W % 4 == 0, W
    return x.reshape(B, H, W // 4, 4, C).transpose(0, 1, 3, 4, 2).reshape(B, H, 4 * C, W // 4)


def pack_stem_weights_planar(w: jnp.ndarray) -> jnp.ndarray:
    """(7,7,C,F) HWIO -> (2F, 336) lhs for the in-kernel dot.

    Column dy*48 + q*16 + (r*C+c) multiplies Z row q-shift block; row s*F+co
    emits output pixel parity s, channel co. Tap dx = 4(q-1) + r - 2s + 3
    (same indexing as `conv_fused.pack_stem_weights`, transposed, with the
    q-blocks padded 12 -> 16 sublane slots to match the kernel's Z layout).
    """
    K, K2, C, F = w.shape
    assert K == 7 and K2 == 7 and 4 * C <= 16
    wt = jnp.zeros((2, F, 7, 3, 16), w.dtype)
    for q in range(3):
        for r in range(4):
            for s in range(2):
                dx = 4 * (q - 1) + r - 2 * s + 3
                if 0 <= dx < 7:
                    # w[:, dx] is (7, C, F) -> (F, 7, C) into slot cols r*C..r*C+C
                    wt = wt.at[s, :, :, q, r * C:(r + 1) * C].set(
                        jnp.transpose(w[:, dx], (2, 0, 1)))
    return wt.reshape(2 * F, 7 * 3 * 16)


def _shift_lanes(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Zero-filled lane shift: out[.., l] = x[.., l - shift].

    Mosaic's rotate only handles 32-bit vectors; for 16-bit data the
    sublane-PAIR bitcast to f32 commutes with a lane rotation (every sublane
    rotates by the same amount), so roll the 32-bit view and cast back.
    """
    if shift == 0:
        return x
    if x.dtype.itemsize == 2:
        assert x.shape[0] % 2 == 0
        x32 = pltpu.bitcast(x, jnp.float32)
        return pltpu.bitcast(_shift_lanes(x32, shift), x.dtype)
    rolled = pltpu.roll(x, shift % x.shape[1], 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    edge = lanes == (0 if shift > 0 else x.shape[1] - 1)
    return jnp.where(edge, jnp.zeros_like(rolled), rolled)


def _stem_kernel(xp_ref, wt_ref, sb_ref, o_ref, z_ref, conv_ref):
    """Grid step = (image, block of 16 pool rows).

    xp_ref: (1, Hp, 16, G) zero-padded planar input (Hp = H + 8)
    wt_ref: (128, 336) packed weights; sb_ref: (2, 128) f32 affine
    o_ref:  (1, 16, F, G) planar pooled output block
    z_ref:  (72*48, G) shifted-triple scratch; conv_ref: (33, 2F, G) scratch
    """
    rb = pl.program_id(1)
    G = xp_ref.shape[3]
    f32 = jnp.float32

    # Z: for the 72 padded input rows this block reads, the lane-shifted
    # triple [q=0: x<<1 | q=1: x | q=2: x>>1] in 16-sublane slots.
    base = 64 * rb
    for zi in range(72):
        row = xp_ref[0, base + zi, :, :]                       # (16, G)
        for q in range(3):
            # block q holds x[.., p + (q-1)]: lane p reads from p+(q-1),
            # i.e. a zero-filled shift by 1-q
            z_ref[pl.ds(zi * 48 + q * 16, 16), :] = _shift_lanes(row, 1 - q)

    scale = sb_ref[0:1, :].astype(f32).reshape(128, 1)
    bias = sb_ref[1:2, :].astype(f32).reshape(128, 1)
    wt = wt_ref[...]

    # 33 conv rows (each pool row r consumes conv rows 2r-1, 2r, 2r+1).
    for jj in range(33):
        zslc = z_ref[pl.ds(2 * jj * 48, 336), :]               # (336, G)
        acc = jax.lax.dot_general(wt, zslc, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)  # (128, G)
        acc = jnp.maximum(acc * scale + bias, 0.0)
        conv_ref[jj, :, :] = acc.astype(conv_ref.dtype)

    # conv row jj=0 of the first block is the j=-1 pool pad row: with ReLU
    # outputs >= 0, zero-fill == reduce_window's -inf pad.
    @pl.when(rb == 0)
    def _():
        conv_ref[0, :, :] = jnp.zeros_like(conv_ref[0, :, :])

    F = o_ref.shape[2]
    for rr in range(16):
        rowmax = jnp.maximum(
            jnp.maximum(conv_ref[2 * rr, :, :], conv_ref[2 * rr + 1, :, :]),
            conv_ref[2 * rr + 2, :, :])                        # (2F, G)
        lo = rowmax[0:F, :]
        hi = rowmax[F:2 * F, :]
        o_ref[0, rr, :, :] = jnp.maximum(jnp.maximum(_shift_lanes(hi, 1), lo), hi)


def _stem_pallas(xp, wt, sb, *, interpret: bool = False):
    """xp: (B, H+8, 16, G) padded planar; -> (B, H//4, F, G) planar pooled."""
    interpret = interpret or jax.default_backend() != "tpu"
    B, Hp, S, G = xp.shape
    H = Hp - 8
    F = wt.shape[0] // 2
    assert H % (4 * _POOL_ROWS_PER_STEP) == 0, H
    blocks = H // (4 * _POOL_ROWS_PER_STEP)
    return pl.pallas_call(
        _stem_kernel,
        grid=(B, blocks),
        in_specs=[
            pl.BlockSpec((1, Hp, S, G), lambda b, rb: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * F, 336), lambda b, rb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * F), lambda b, rb: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _POOL_ROWS_PER_STEP, F, G),
                               lambda b, rb: (b, rb, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 4, F, G), xp.dtype),
        scratch_shapes=[pltpu.VMEM((72 * 48, G), xp.dtype),
                        pltpu.VMEM((33, 2 * F, G), xp.dtype)],
        interpret=interpret,
    )(xp, wt, sb)


# exact-arity lambda: custom_partitioning rejects unfilled keyword defaults
_stem_sharded = batch_partitioned(
    lambda xp, wt, sb: _stem_pallas(xp, wt, sb),
    batched=(0,), ndims=(4, 2, 2), out_ndim=4,
    rule="b h s g, m k, t m -> b p f g")


def supports_fused_stem(x: jnp.ndarray) -> bool:
    """Eligibility: NHWC with 4C <= 16 sublane slots, W % 4 == 0, lane-dense
    width groups (W/4 a multiple of 128), and H divisible by the 64-row
    grid block."""
    if x.ndim != 4:
        return False
    _, H, W, C = x.shape
    return (4 * C <= 16 and W % 4 == 0 and (W // 4) % 128 == 0
            and H % (4 * _POOL_ROWS_PER_STEP) == 0 and H >= 4 * _POOL_ROWS_PER_STEP)


def fused_stem(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
               bias: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """NHWC (B,H,W,C) -> NHWC (B,H/4,W/4,F) fused stem.

    Exact fusion of: conv7x7/s2/pad3 (kernel `w`, HWIO) -> per-channel
    affine (`scale`, `bias` — the folded eval BatchNorm) -> ReLU ->
    maxpool3x3/s2/pad1.
    """
    assert supports_fused_stem(x), x.shape
    F = w.shape[-1]
    xp = to_planar(x)
    xp = jnp.pad(xp, ((0, 0), (5, 3), (0, 16 - xp.shape[2]), (0, 0)))
    wt = pack_stem_weights_planar(w.astype(x.dtype))
    sb = jnp.stack([jnp.tile(scale.astype(jnp.float32), 2),
                    jnp.tile(bias.astype(jnp.float32), 2)])
    if interpret:
        planar = _stem_pallas(xp, wt, sb, interpret=True)
    else:
        planar = _stem_sharded(xp, wt, sb)
    # pooled planar is (B, H/4, F, W/4): the pool merged the pixel-parity
    # packing, leaving plain channels in sublanes and output width in lanes.
    # One XLA transpose of the 16x-downsampled map converts to NHWC.
    return planar.transpose(0, 1, 3, 2)
