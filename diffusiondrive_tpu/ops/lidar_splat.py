"""Lidar point -> BEV histogram splatting, TPU-native.

Replaces the host-side `np.histogramdd` splat of the feature builder
(`transfuser_features.py:106-124`). TPU has no fast scatter, but a 2D count
histogram factorizes into a matmul:

    hist[i, j] = sum_n onehot_x[n, i] * onehot_y[n, j]  =  A^T @ B

so the Pallas kernel streams point chunks through VMEM, builds the two
one-hot matrices on the VPU (iota compare) and accumulates A^T B on the MXU
in fp32 — histogram at matmul speed-of-light. Out-of-range / padded points
get index -1 => all-zero one-hot rows.

`splat_points_jax` is the pure-jnp twin (scatter-add) used on CPU and as the
numerics reference; both match `np.histogramdd` exactly (integer counts).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bin_indices(
    points_xy: jnp.ndarray, valid: jnp.ndarray, min_x, max_x, min_y, max_y, bins: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """np.histogramdd bin indices: [e_i, e_{i+1}) half-open, last bin closed;
    out-of-range or invalid points get -1."""
    scale_x = bins / (max_x - min_x)
    scale_y = bins / (max_y - min_y)
    ix = jnp.floor((points_xy[..., 0] - min_x) * scale_x).astype(jnp.int32)
    iy = jnp.floor((points_xy[..., 1] - min_y) * scale_y).astype(jnp.int32)
    in_x = (points_xy[..., 0] >= min_x) & (points_xy[..., 0] <= max_x)
    in_y = (points_xy[..., 1] >= min_y) & (points_xy[..., 1] <= max_y)
    ix = jnp.clip(ix, 0, bins - 1)  # right edge belongs to the last bin
    iy = jnp.clip(iy, 0, bins - 1)
    ok = in_x & in_y & valid
    return jnp.where(ok, ix, -1), jnp.where(ok, iy, -1)


def _splat_kernel(ix_ref, iy_ref, out_ref, acc_ref):
    """One grid step: accumulate the chunk's one-hot outer product."""
    chunk = ix_ref.shape[0]  # block (chunk, 1)
    bins = acc_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ix = ix_ref[:]  # (chunk, 1)
    iy = iy_ref[:]
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, bins), 1)
    a = (cols == ix).astype(jnp.float32)  # (chunk, bins) one-hot x
    b = (cols == iy).astype(jnp.float32)  # (chunk, bins) one-hot y
    acc_ref[:] += jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bins", "chunk"))
def histogram2d_pallas(
    ix: jnp.ndarray, iy: jnp.ndarray, bins: int = 256, chunk: int = 1024
) -> jnp.ndarray:
    """(N,) int32 bin indices (-1 = skip) -> (bins, bins) fp32 counts."""
    n = ix.shape[0]
    pad = (-n) % chunk
    if pad:
        ix = jnp.pad(ix, (0, pad), constant_values=-1)
        iy = jnp.pad(iy, (0, pad), constant_values=-1)
    num_chunks = ix.shape[0] // chunk
    ix = ix.reshape(-1, 1)
    iy = iy.reshape(-1, 1)

    return pl.pallas_call(
        _splat_kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bins, bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bins, bins), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bins, bins), jnp.float32)],
    )(ix, iy)


def histogram2d_jax(ix: jnp.ndarray, iy: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Scatter-add twin of the Pallas kernel (CPU fallback / reference)."""
    ok = ix >= 0
    flat = jnp.where(ok, ix * bins + iy, bins * bins)  # overflow bucket
    counts = jnp.zeros(bins * bins + 1, jnp.float32).at[flat].add(1.0)
    return counts[:-1].reshape(bins, bins)


def splat_points(
    points: jnp.ndarray,              # (N, 3) x, y, z (padded)
    valid: jnp.ndarray,               # (N,) bool
    min_x: float = -32.0,
    max_x: float = 32.0,
    min_y: float = -32.0,
    max_y: float = 32.0,
    bins: int = 256,
    max_height: float = 100.0,
    split_height: float = 0.2,
    hist_max_per_pixel: int = 5,
    use_pallas: bool = None,
) -> jnp.ndarray:
    """Full lidar BEV feature: z-filter + above-plane histogram, clipped and
    normalized (`transfuser_features.py:106-135`). Returns (bins, bins, 1)."""
    if use_pallas is None:
        # Mosaic kernels cannot be auto-partitioned by GSPMD; callers whose
        # program is sharded must wrap the splat in shard_map (see
        # `ops/preprocessing.py:lidar_bev`, which does exactly that when given
        # a mesh) or pass use_pallas=False explicitly. The default only keys
        # on the platform so single-device programs on multi-chip hosts still
        # get the fast kernel.
        use_pallas = jax.default_backend() == "tpu"
    keep = valid & (points[:, 2] < max_height) & (points[:, 2] > split_height)
    ix, iy = _bin_indices(points[:, :2], keep, min_x, max_x, min_y, max_y, bins)
    hist = histogram2d_pallas(ix, iy, bins) if use_pallas else histogram2d_jax(ix, iy, bins)
    hist = jnp.minimum(hist, hist_max_per_pixel) / hist_max_per_pixel
    return hist[..., None]


batched_splat_points = jax.vmap(splat_points, in_axes=(0, 0))
