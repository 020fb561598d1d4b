"""Spatial sampling ops: bilinear grid-sample, resize, adaptive average pool.

TPU-first notes:
- Layout is NHWC everywhere (channels-last vectorizes on the VPU lanes and
  feeds the MXU without transposes); the torch reference is NCHW.
- `grid_sample` (used by the cascade decoder's cross-BEV attention,
  `modules/blocks.py:117-122`) touches only num_queries*num_points ≈ 160
  points per sample, so a 4-corner XLA gather beats a custom kernel; the
  compiler fuses the corner weights into the gather consumers.
- `resize_bilinear` matches torch `F.interpolate(mode='bilinear',
  align_corners=False)` / cv2 half-pixel semantics via `jax.image.resize`.
- Adaptive average pooling in the backbone always sees integer
  downsample factors (e.g. 64x256 -> 8x32), so it lowers to a reshape-mean,
  which XLA turns into a single fused reduction.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def grid_sample_2d(
    value: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear grid sampling with zero padding.

    :param value: (N, H, W, C) feature map
    :param grid: (N, Hg, Wg, 2) sample locations in [-1, 1]; last dim is
        (x=width, y=height) — the torch `F.grid_sample` convention.
    :return: (N, Hg, Wg, C) sampled features
    """
    N, H, W, C = value.shape

    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (W - 1)
        iy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((gx + 1.0) * W - 1.0) * 0.5
        iy = ((gy + 1.0) * H - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0

    def corner(px: jnp.ndarray, py: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Gather value[:, py, px, :] with zero padding for out-of-bounds."""
        valid = (px >= 0) & (px < W) & (py >= 0) & (py < H)
        pxc = jnp.clip(px, 0, W - 1).astype(jnp.int32)
        pyc = jnp.clip(py, 0, H - 1).astype(jnp.int32)
        gathered = jax.vmap(lambda v, yy, xx: v[yy, xx])(value, pyc, pxc)
        return gathered, valid

    v00, m00 = corner(ix0, iy0)
    v01, m01 = corner(ix0 + 1, iy0)
    v10, m10 = corner(ix0, iy0 + 1)
    v11, m11 = corner(ix0 + 1, iy0 + 1)

    w00 = ((1.0 - tx) * (1.0 - ty))[..., None]
    w01 = (tx * (1.0 - ty))[..., None]
    w10 = ((1.0 - tx) * ty)[..., None]
    w11 = (tx * ty)[..., None]

    out = (
        jnp.where(m00[..., None], v00, 0.0) * w00
        + jnp.where(m01[..., None], v01, 0.0) * w01
        + jnp.where(m10[..., None], v10, 0.0) * w10
        + jnp.where(m11[..., None], v11, 0.0) * w11
    )
    return out


def resize_bilinear(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Bilinear resize of (N, H, W, C) to (N, *size, C); half-pixel centers
    (torch ``align_corners=False``)."""
    N, _, _, C = x.shape
    return jax.image.resize(x, (N, size[0], size[1], C), method="bilinear")


def resize_bilinear_no_aa(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Bilinear resize WITHOUT antialiasing — exact cv2 INTER_LINEAR /
    torch `F.interpolate` semantics for downsampling (half-pixel centers,
    2-tap kernel). `jax.image.resize` antialiases on downsample, which the
    camera stitcher must NOT do to match the trained reference pipeline.
    """
    N, H, W, C = x.shape
    oh, ow = size
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (H / oh) - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (W / ow) - 0.5

    y0 = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ty = jnp.clip(ys - y0, 0.0, 1.0)[None, :, None, None]
    tx = jnp.clip(xs - x0, 0.0, 1.0)[None, None, :, None]

    x = x.astype(jnp.float32)
    top = x[:, y0][:, :, x0] * (1 - tx) + x[:, y0][:, :, x1] * tx
    bot = x[:, y1][:, :, x0] * (1 - tx) + x[:, y1][:, :, x1] * tx
    return top * (1 - ty) + bot * ty


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: Sequence[int]) -> jnp.ndarray:
    """Average pool (N, H, W, C) to (N, *output_size, C).

    Requires integer pooling factors (always true in this model family); the
    reshape-mean form compiles to one fused reduction.
    """
    N, H, W, C = x.shape
    oh, ow = output_size
    assert H % oh == 0 and W % ow == 0, f"adaptive pool needs integer factors, got {(H, W)} -> {(oh, ow)}"
    fh, fw = H // oh, W // ow
    y = x.reshape(N, oh, fh, ow, fw, C)
    # Two-stage mean, first stage in the input dtype: jnp.mean's automatic
    # bf16 -> f32 upcast makes XLA materialize a full-precision copy of the
    # largest activation in the network (profiled: an extra 67 MB HBM write +
    # read at layer1). Averaging the fw<=8 window in bf16 first keeps the big
    # tensor in bf16; the 8x smaller second stage accumulates in f32.
    y = y.mean(axis=4, dtype=y.dtype)
    return y.mean(axis=2, dtype=jnp.float32).astype(x.dtype)

def onehot_take_rows(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather ``arr[b, idx[b, i]]`` as a one-hot contraction.

    On TPU a (B, N) `take_along_axis` inside a jitted (and especially a
    differentiated) program lowers to a serialized gather — measured at
    ~3.9 ms/step in the round-4 train trace for the loss's 30-row gathers —
    while the one-hot einsum runs on the MXU in microseconds and transposes
    to another matmul instead of a scatter in the backward pass.

    :param arr: (B, N, ...) source
    :param idx: (B, I) int indices into axis 1
    :return: (B, I, ...) gathered rows, float32
    """
    n = arr.shape[1]
    onehot = jax.nn.one_hot(idx, n, dtype=jnp.float32)         # (B, I, N)
    flat = arr.reshape(arr.shape[0], n, -1).astype(jnp.float32)
    out = jnp.einsum("bin,bnc->bic", onehot, flat)
    return out.reshape(idx.shape + arr.shape[2:])
