"""nuScenes open-loop planning metrics: L2 displacement + collision rate.

Parity target: the reference's nuScenes evaluation protocol (`README.md:86`:
L2 avg over 1s/2s/3s and collision %, ST-P3 convention — metrics averaged
over the horizon prefix at each marker). The planner predicts 6 poses at
0.5 s on nuScenes; collisions test the ego footprint against BEV occupancy
of other agents at each future step.

Batched and jit-friendly: L2 is pure array math; collision uses the same
padded polygon-intersection primitive as the PDM scorer.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from diffusiondrive_tpu.evaluate.geometry import polygons_intersect
from diffusiondrive_tpu.evaluate.state_array import box_to_corners
from diffusiondrive_tpu.evaluate.vehicle import get_pacifica_parameters


def l2_displacement(
    pred: jnp.ndarray,     # (B, T, >=2) predicted poses (ego frame)
    target: jnp.ndarray,   # (B, T, >=2) GT poses
    horizons_s: Sequence[float] = (1.0, 2.0, 3.0),
    interval_s: float = 0.5,
    st_p3_average: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Per-horizon L2 [m]. With `st_p3_average` each marker averages the error
    over all steps up to that horizon (the convention behind 0.27/0.54/0.90)."""
    err = jnp.linalg.norm(pred[..., :2] - target[..., :2], axis=-1)  # (B, T)
    out = {}
    for h in horizons_s:
        idx = int(round(h / interval_s))
        if st_p3_average:
            out[f"l2_{h:.0f}s"] = err[:, :idx].mean(axis=-1)
        else:
            out[f"l2_{h:.0f}s"] = err[:, idx - 1]
    out["l2_avg"] = jnp.stack([out[f"l2_{h:.0f}s"] for h in horizons_s], -1).mean(-1)
    return out


def collision_rate(
    pred: jnp.ndarray,          # (B, T, 3) predicted ego poses (ego frame @ t=0)
    agent_boxes: jnp.ndarray,   # (B, T, O, 5) future agent boxes (x,y,heading,l,w), ego frame
    agent_valid: jnp.ndarray,   # (B, T, O)
    horizons_s: Sequence[float] = (1.0, 2.0, 3.0),
    interval_s: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Fraction of samples whose ego footprint hits any agent box within each
    horizon (cumulative, ST-P3 style)."""
    vehicle = get_pacifica_parameters()
    B, T, _ = pred.shape

    cx = pred[..., 0] + vehicle.rear_axle_to_center * jnp.cos(pred[..., 2])
    cy = pred[..., 1] + vehicle.rear_axle_to_center * jnp.sin(pred[..., 2])
    ego_corners = box_to_corners(cx, cy, pred[..., 2],
                                 jnp.full_like(cx, vehicle.length), jnp.full_like(cx, vehicle.width),
                                 xp=jnp)                              # (B, T, 4, 2)
    agent_corners = box_to_corners(
        agent_boxes[..., 0], agent_boxes[..., 1], agent_boxes[..., 2],
        agent_boxes[..., 3], agent_boxes[..., 4], xp=jnp,
    )                                                                 # (B, T, O, 4, 2)

    hits = polygons_intersect(ego_corners[:, :, None], agent_corners) & agent_valid  # (B, T, O)
    any_hit = jnp.any(hits, axis=-1)  # (B, T)

    out = {}
    for h in horizons_s:
        idx = int(round(h / interval_s))
        out[f"collision_{h:.0f}s"] = jnp.any(any_hit[:, :idx], axis=-1).astype(jnp.float32)
    out["collision_avg"] = jnp.stack([out[f"collision_{h:.0f}s"] for h in horizons_s], -1).mean(-1)
    return out


def evaluate_nuscenes(
    pred_trajectories: np.ndarray,
    gt_trajectories: np.ndarray,
    agent_boxes: np.ndarray,
    agent_valid: np.ndarray,
    interval_s: float = 0.5,
) -> Dict[str, float]:
    """Aggregate L2 + collision metrics over a dataset (reference table format)."""
    l2 = l2_displacement(jnp.asarray(pred_trajectories), jnp.asarray(gt_trajectories),
                         interval_s=interval_s)
    col = collision_rate(jnp.asarray(pred_trajectories), jnp.asarray(agent_boxes),
                         jnp.asarray(agent_valid), interval_s=interval_s)
    out = {k: float(np.mean(np.asarray(v))) for k, v in {**l2, **col}.items()}
    return out
