"""Fused device-side sensor preprocessing.

The reference preprocesses on host per token (cv2 resize + np.histogramdd,
`transfuser_features.py:57-138`). For batched TPU evaluation the math moves
on-device and fuses with the backbone's first conv:

- `stitch_cameras`: crop l0/f0/r0, hstack, bilinear-resize to 1024x256,
  scale to [0, 1] — all in one jitted program over the batch,
- `lidar_bev`: padded point clouds -> 256x256 histogram via the Pallas
  one-hot-matmul splat kernel (`ops/lidar_splat.py`).

Host work shrinks to JPEG decode + PCD parse + padding.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.ops.lidar_splat import splat_points
from diffusiondrive_tpu.ops.sampling import resize_bilinear_no_aa

# OpenScene camera crops (`transfuser_features.py:64-69`)
ROW_CROP = (28, -28)
SIDE_COL_CROP = (416, -416)


def stitch_cameras(
    l0: jnp.ndarray, f0: jnp.ndarray, r0: jnp.ndarray,
    out_height: int = 256, out_width: int = 1024,
) -> jnp.ndarray:
    """(B, 1080, 1920, 3) uint8 cams -> (B, out_h, out_w, 3) float32 in [0,1]."""
    l0c = l0[:, ROW_CROP[0] : ROW_CROP[1], SIDE_COL_CROP[0] : SIDE_COL_CROP[1]]
    f0c = f0[:, ROW_CROP[0] : ROW_CROP[1]]
    r0c = r0[:, ROW_CROP[0] : ROW_CROP[1], SIDE_COL_CROP[0] : SIDE_COL_CROP[1]]
    stitched = jnp.concatenate([l0c, f0c, r0c], axis=2).astype(jnp.float32)
    resized = resize_bilinear_no_aa(stitched, (out_height, out_width))
    return resized / 255.0


def lidar_bev(
    points: jnp.ndarray, valid: jnp.ndarray, config: TransfuserConfig = None, mesh=None
) -> jnp.ndarray:
    """(B, N, 3) padded points + (B, N) mask -> (B, 256, 256, 1) BEV feature.

    With a multi-device `mesh`, the splat runs inside `shard_map` over the
    `data` axis so the Pallas kernel executes per-device on its local batch
    shard (GSPMD cannot auto-partition Mosaic kernels; without this the
    sharded eval path would silently fall back to the slow scatter-add)."""
    config = config or TransfuserConfig()

    def one(p, v):
        return splat_points(
            p, v,
            min_x=config.lidar_min_x, max_x=config.lidar_max_x,
            min_y=config.lidar_min_y, max_y=config.lidar_max_y,
            bins=config.lidar_resolution_width,
            max_height=config.max_height_lidar,
            split_height=config.lidar_split_height,
            hist_max_per_pixel=config.hist_max_per_pixel,
        )

    if mesh is None or mesh.size == 1:
        return jax.vmap(one)(points, valid)

    from jax.sharding import PartitionSpec as P

    from diffusiondrive_tpu.parallel.mesh import DATA_AXIS

    spec = P(DATA_AXIS)
    return jax.shard_map(
        jax.vmap(one), mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )(points, valid)


def pad_point_cloud(lidar_pc: np.ndarray, max_points: int = 131072) -> Tuple[np.ndarray, np.ndarray]:
    """(6, N) host point cloud -> ((max_points, 3), (max_points,)) padded xyz."""
    xyz = lidar_pc[:3].T.astype(np.float32)
    n = min(len(xyz), max_points)
    points = np.zeros((max_points, 3), np.float32)
    valid = np.zeros(max_points, bool)
    points[:n] = xyz[:n]
    valid[:n] = True
    return points, valid
