"""PDM closed-loop scorer, fully vectorized (pure JAX).

Parity: `pdm_planner/scoring/pdm_scorer.py` (PDMScorer/PDMScorerConfig) and
`pdm_scorer_utils.py:get_collision_type`. Re-implements nuPlan's closed-loop
metric suite on simulated proposal states:

multiplicative: no-at-fault-collision, drivable-area, (driving-direction is
weighted with weight 0); weighted: progress (5), TTC (5), comfort (2).

Design: the reference walks timesteps sequentially, mutating per-proposal
"already collided" token lists. The decision structure is equivalent to a
per-(proposal, track) *first-intersection* rule: the classification at the
first intersecting event decides (at-fault -> score penalty; else the token
is ignored forever). That reformulation removes all sequential state, so
collision and TTC become dense boolean tensors over (proposal, time, object)
reduced with argmax/min — one XLA program per scene, vmappable over scenes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from diffusiondrive_tpu.common.dataclasses import TrajectorySampling
from diffusiondrive_tpu.common.enums import (
    BBCoordsIndex,
    EgoAreaIndex,
    MultiMetricIndex,
    StateIndex,
    WeightedMetricIndex,
)
from diffusiondrive_tpu.common.geometry import normalize_angle
from diffusiondrive_tpu.evaluate.comfort import ego_is_comfortable
from diffusiondrive_tpu.evaluate.geometry import (
    points_in_polygons,
    polygons_intersect,
    project_onto_polyline,
    segment_intersects_polygon,
)
from diffusiondrive_tpu.evaluate.observation import MapLayer
from diffusiondrive_tpu.evaluate.state_array import (
    box_to_corners,
    coords_to_exterior,
    state_array_to_coords_array,
)
from diffusiondrive_tpu.evaluate.vehicle import VehicleParameters, get_pacifica_parameters

STOPPED_TRACK_SPEED = 5e-2   # [m/s] for collision typing
AHEAD_ANGLE_DEG = 30.0       # is_agent_ahead tolerance
BEHIND_ANGLE_DEG = 150.0     # is_agent_behind tolerance


@dataclasses.dataclass(frozen=True)
class PDMScorerConfig:
    progress_weight: float = 5.0
    ttc_weight: float = 5.0
    comfortable_weight: float = 2.0
    driving_direction_weight: float = 0.0

    driving_direction_horizon: float = 1.0          # [s]
    driving_direction_compliance_threshold: float = 2.0  # [m]
    driving_direction_violation_threshold: float = 6.0   # [m]
    stopped_speed_threshold: float = 5e-3           # [m/s] (ttc)
    progress_distance_threshold: float = 5.0        # [m]

    # Sequential chunk over the object dim for the dense collision/TTC
    # edge-pair tensors ((B,T,S,O,5,V) floats): lax.map keeps only one chunk
    # of O live at a time, lifting the scene-batch HBM ceiling ~O/chunk x.
    # None disables chunking.
    object_chunk: int = 16


class ScorerOutput(NamedTuple):
    """Per-proposal final score and sub-metrics (all shape (B,))."""

    score: jnp.ndarray
    no_at_fault_collisions: jnp.ndarray
    drivable_area_compliance: jnp.ndarray
    driving_direction_compliance: jnp.ndarray
    progress_normalized: jnp.ndarray
    progress_raw: jnp.ndarray
    ttc: jnp.ndarray
    comfort: jnp.ndarray
    collision_time_idcs: jnp.ndarray
    ttc_time_idcs: jnp.ndarray


def _is_ahead(ego_pose: jnp.ndarray, target_xy: jnp.ndarray) -> jnp.ndarray:
    """nuplan `is_agent_ahead`: target within +-30 deg of ego heading."""
    angle = normalize_angle(
        jnp.arctan2(target_xy[..., 1] - ego_pose[..., 1], target_xy[..., 0] - ego_pose[..., 0])
        - ego_pose[..., 2],
        xp=jnp,
    )
    return jnp.abs(angle) < np.deg2rad(AHEAD_ANGLE_DEG)


def _is_behind(ego_pose: jnp.ndarray, target_xy: jnp.ndarray) -> jnp.ndarray:
    """nuplan `is_agent_behind`: target beyond +-150 deg of ego heading."""
    angle = normalize_angle(
        jnp.arctan2(target_xy[..., 1] - ego_pose[..., 1], target_xy[..., 0] - ego_pose[..., 0])
        - ego_pose[..., 2],
        xp=jnp,
    )
    return jnp.abs(angle) > np.deg2rad(BEHIND_ANGLE_DEG)


def _intersect_over_object_chunks(ego_rings: jnp.ndarray, polys: jnp.ndarray,
                                  chunk: int) -> jnp.ndarray:
    """`polygons_intersect(ego_rings[..., None], polys)` with the object dim
    O processed in sequential chunks via `lax.map`, bounding the live
    edge-pair intermediates to one chunk of O.

    :param ego_rings: (..., 5, 2) ego rings, batch dims say (B, T[, S])
    :param polys: (T[, S], O, V, 2) track rings (no leading B)
    :return: bool (B, T[, S], O)
    """
    import jax

    O = polys.shape[-3]
    if not chunk or O <= chunk:
        return polygons_intersect(ego_rings[..., None, :, :], polys[None])
    n_chunks = -(-O // chunk)
    pad = n_chunks * chunk - O
    polys_p = jnp.concatenate([polys, jnp.repeat(polys[..., -1:, :, :], pad, axis=-3)], axis=-3) \
        if pad else polys
    # (T[,S], n, chunk, V, 2) -> (n, T[,S], chunk, V, 2)
    polys_c = polys_p.reshape(*polys.shape[:-3], n_chunks, chunk, *polys.shape[-2:])
    polys_c = jnp.moveaxis(polys_c, -4, 0)

    def body(p):
        return polygons_intersect(ego_rings[..., None, :, :], p[None])  # (B, T[,S], chunk)

    hits = jax.lax.map(body, polys_c)                 # (n, B, T[,S], chunk)
    hits = jnp.moveaxis(hits, 0, -2)                  # (B, T[,S], n, chunk)
    return hits.reshape(*hits.shape[:-2], n_chunks * chunk)[..., :O]


def score_proposals(
    states: jnp.ndarray,            # (B, T, 11) simulated proposal states
    track_poses: jnp.ndarray,       # (L, O, 3) occupancy forecast box poses
    track_extents: jnp.ndarray,     # (O, 2) box (length, width)
    track_valid: jnp.ndarray,       # (O,)
    track_is_agent: jnp.ndarray,    # (O,)
    track_is_red_light: jnp.ndarray,   # (O,)
    track_is_stopped: jnp.ndarray,  # (O,)
    track_previously_collided: jnp.ndarray,  # (O,)
    global_to_local: jnp.ndarray,   # (>= T + 9,) int
    map_polygons: jnp.ndarray,      # (P, V, 2)
    map_valid: jnp.ndarray,         # (P,)
    map_layers: jnp.ndarray,        # (P,)
    map_on_route: jnp.ndarray,      # (P,)
    centerline: jnp.ndarray,        # (Lc, 2)
    proposal_sampling: TrajectorySampling,
    config: PDMScorerConfig = PDMScorerConfig(),
    vehicle: VehicleParameters = None,
) -> ScorerOutput:
    vehicle = vehicle or get_pacifica_parameters()
    B, T, _ = states.shape
    interval = proposal_sampling.interval_length

    ego_coords = state_array_to_coords_array(states, vehicle, xp=jnp)   # (B, T, 5, 2)
    ego_rings = coords_to_exterior(ego_coords, xp=jnp)                  # (B, T, 5, 2) closed ring

    # ------------------------------------------------------------------ #
    # Ego areas (`_calculate_ego_area`)
    # ------------------------------------------------------------------ #
    in_poly = points_in_polygons(ego_coords, map_polygons) & map_valid  # (B, T, 5, P)
    corners_in = in_poly[..., : BBCoordsIndex.CENTER, :]                # (B, T, 4, P)
    center_in = in_poly[..., BBCoordsIndex.CENTER, :]                   # (B, T, P)

    lane_mask = jnp.isin(map_layers, jnp.asarray(MapLayer.DRIVABLE_LANES)) & map_valid
    drivable_mask = jnp.isin(map_layers, jnp.asarray(MapLayer.DRIVABLE)) & map_valid
    on_route_lane_mask = lane_mask & map_on_route

    corners_per_lane = jnp.where(lane_mask, corners_in.sum(axis=-2), 0)      # (B, T, P)
    multiple_lanes = ((corners_per_lane > 0).sum(-1) > 1) & jnp.all(
        jnp.where(lane_mask, corners_per_lane, -1) != 4, axis=-1
    )
    corner_in_any_drivable = jnp.any(corners_in & drivable_mask, axis=-1)    # (B, T, 4)
    non_drivable = corner_in_any_drivable.sum(-1) < 4
    oncoming = jnp.where(on_route_lane_mask, center_in, False).sum(-1) == 0

    multi_or_nondrivable = multiple_lanes | non_drivable                     # (B, T)

    # ------------------------------------------------------------------ #
    # No-at-fault collision (`_calculate_no_at_fault_collision`)
    # ------------------------------------------------------------------ #
    # Expand compact (pose, extent) tracks into 4-corner rings IN-GRAPH: the
    # cache/H2D payload stays 3 floats per (L, O) cell, and the intersection
    # tests below see V=4 rings (vs the 16-vertex padded layout this replaces)
    def expand_corners(poses):
        """poses (..., O, 3) + extents (O, 2) -> rings (..., O, 4, 2)."""
        return box_to_corners(
            poses[..., 0], poses[..., 1], poses[..., 2],
            track_extents[..., 0], track_extents[..., 1], xp=jnp,
        )

    g2l = global_to_local[:T]
    poses_t = track_poses[g2l]           # (T, O, 3)
    polys_t = expand_corners(poses_t)    # (T, O, 4, 2)
    centers_t = poses_t[..., :2]         # (T, O, 2)

    collides = _intersect_over_object_chunks(ego_rings, polys_t, config.object_chunk) & track_valid  # (B, T, O)

    eligible = track_valid & ~track_is_red_light & ~track_previously_collided
    collides_eligible = collides & eligible

    any_collision = jnp.any(collides_eligible, axis=1)                      # (B, O)
    first_t = jnp.argmax(collides_eligible, axis=1)                         # (B, O)

    def gather_t(arr, idx):
        """arr (B, T, ...) indexed at per-(B,O) times -> (B, O, ...)."""
        return jnp.take_along_axis(arr, idx.reshape(B, -1, *(1,) * (arr.ndim - 2)), axis=1)

    speeds = jnp.hypot(states[..., StateIndex.VELOCITY_X], states[..., StateIndex.VELOCITY_Y])  # (B, T)
    ego_pose_first = gather_t(states[..., StateIndex.STATE_SE2], first_t[..., None])            # (B, O, 3)
    ego_ring_first = jnp.take_along_axis(ego_rings, first_t[..., None, None], axis=1)           # (B, O, 5, 2)
    ego_speed_first = jnp.take_along_axis(speeds, first_t, axis=1)                              # (B, O)
    multi_nd_first = jnp.take_along_axis(multi_or_nondrivable, first_t, axis=1)                 # (B, O)

    # polygon of track o at its first collision time: gather the compact pose
    # then expand — gathering 3 floats instead of a (V, 2) ring
    track_pose_first = poses_t[first_t, jnp.arange(poses_t.shape[1])[None, :]]   # (B, O, 3)
    track_poly_first = expand_corners(track_pose_first)                          # (B, O, 4, 2)
    track_center_first = track_pose_first[..., :2]                               # (B, O, 2)

    is_ego_stopped = ego_speed_first <= STOPPED_TRACK_SPEED
    behind = _is_behind(ego_pose_first, track_center_first)
    front_seg_hit = segment_intersects_polygon(
        ego_ring_first[..., BBCoordsIndex.FRONT_LEFT, :],
        ego_ring_first[..., BBCoordsIndex.FRONT_RIGHT, :],
        track_poly_first,
    )

    # collision typing precedence (`pdm_scorer_utils.py:13-68`)
    stopped_track = ~is_ego_stopped & track_is_stopped
    active_rear = ~is_ego_stopped & ~track_is_stopped & behind
    active_front = ~is_ego_stopped & ~track_is_stopped & ~behind & front_seg_hit
    active_lateral = ~is_ego_stopped & ~track_is_stopped & ~behind & ~front_seg_hit

    at_fault = (stopped_track | active_front | (multi_nd_first & active_lateral)) & any_collision
    contribution = jnp.where(at_fault, jnp.where(track_is_agent, 0.0, 0.5), 1.0)
    no_collision_score = jnp.min(contribution, axis=-1)                      # (B,)

    collision_times = jnp.where(at_fault, first_t, jnp.inf)
    collision_time_idcs = jnp.min(collision_times, axis=-1)

    # ------------------------------------------------------------------ #
    # Drivable-area compliance + driving direction
    # ------------------------------------------------------------------ #
    drivable_score = jnp.where(jnp.any(non_drivable, axis=-1), 0.0, 1.0)

    centers = ego_coords[:, :, BBCoordsIndex.CENTER]                         # (B, T, 2)
    step_progress = jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.linalg.norm(jnp.diff(centers, axis=1), axis=-1)], axis=1
    )
    oncoming_progress = jnp.where(oncoming, step_progress, 0.0)
    horizon = int(config.driving_direction_horizon / interval)
    # windowed sum over [t-horizon, t]
    cums = jnp.concatenate([jnp.zeros((B, 1)), jnp.cumsum(oncoming_progress, axis=1)], axis=1)
    idx_hi = np.arange(T) + 1
    idx_lo = np.maximum(0, np.arange(T) - horizon)
    windowed = cums[:, idx_hi] - cums[:, idx_lo]
    max_oncoming = jnp.max(windowed, axis=-1)
    dd_score = jnp.where(
        max_oncoming < config.driving_direction_compliance_threshold,
        1.0,
        jnp.where(max_oncoming < config.driving_direction_violation_threshold, 0.5, 0.0),
    )

    # ------------------------------------------------------------------ #
    # Progress along centerline (`_calculate_progress`)
    # ------------------------------------------------------------------ #
    start_arc = project_onto_polyline(centers[:, 0], centerline)
    end_arc = project_onto_polyline(centers[:, -1], centerline)
    progress_raw = jnp.clip(end_arc - start_arc, 0.0, None)

    # ------------------------------------------------------------------ #
    # TTC (`_calculate_ttc`)
    # ------------------------------------------------------------------ #
    future_steps = np.arange(0, 10, 3)                                       # [0, 3, 6, 9]
    S = len(future_steps)
    ttc_rings = ego_rings[:, :, None, :, :].repeat(S, axis=2)                # (B, T, S, 5, 2)
    dxy = jnp.stack(
        [jnp.cos(states[..., StateIndex.HEADING]) * speeds,
         jnp.sin(states[..., StateIndex.HEADING]) * speeds], axis=-1
    )                                                                        # (B, T, 2)
    deltas = jnp.asarray(future_steps, dtype=states.dtype) * interval        # (S,)
    ttc_rings = ttc_rings + dxy[:, :, None, None, :] * deltas[None, None, :, None, None]

    # observation at t + future_step (extended horizon)
    fut_idx = np.arange(T)[:, None] + future_steps[None, :]                  # (T, S)
    g2l_fut = global_to_local[fut_idx]                                       # (T, S)
    poses_fut = track_poses[g2l_fut]                                         # (T, S, O, 3)
    polys_fut = expand_corners(poses_fut)                                    # (T, S, O, 4, 2)
    centers_fut = poses_fut[..., :2]                                         # (T, S, O, 2)

    ttc_hits = _intersect_over_object_chunks(ttc_rings, polys_fut, config.object_chunk) & track_valid  # (B, T, S, O)
    moving = speeds >= config.stopped_speed_threshold                        # (B, T)
    ttc_events = ttc_hits & eligible & moving[:, :, None, None]

    flat_events = ttc_events.transpose(0, 3, 1, 2).reshape(B, -1, T * S)     # (B, O, T*S)
    any_event = jnp.any(flat_events, axis=-1)
    first_event = jnp.argmax(flat_events, axis=-1)                           # (B, O) in t*S+s order
    ev_t = first_event // S
    ev_s = first_event % S

    ego_pose_ev = gather_t(states[..., StateIndex.STATE_SE2], ev_t[..., None])  # (B, O, 3)
    multi_nd_ev = jnp.take_along_axis(multi_or_nondrivable, ev_t, axis=1)

    intersection_mask = (map_layers == MapLayer.INTERSECTION) & map_valid
    rear_in_intersection = jnp.any(
        points_in_polygons(states[..., StateIndex.POINT], map_polygons) & intersection_mask, axis=-1
    )                                                                        # (B, T)
    rear_in_int_ev = jnp.take_along_axis(rear_in_intersection, ev_t, axis=1)

    # track centroid at the event's projected time
    O = centers_fut.shape[2]
    track_center_ev = centers_fut[ev_t, ev_s, jnp.arange(O)[None, :]]        # (B, O, 2)

    ahead_ev = _is_ahead(ego_pose_ev, track_center_ev)
    behind_ev = _is_behind(ego_pose_ev, track_center_ev)
    ttc_fault = (ahead_ev | ((multi_nd_ev | rear_in_int_ev) & ~behind_ev)) & any_event

    ttc_score = jnp.where(jnp.any(ttc_fault, axis=-1), 0.0, 1.0)
    ttc_times = jnp.where(ttc_fault, ev_t, jnp.inf)
    ttc_time_idcs = jnp.min(ttc_times, axis=-1)

    # ------------------------------------------------------------------ #
    # Comfort + aggregation (`_calculate_is_comfortable`, `_aggregate_scores`)
    # ------------------------------------------------------------------ #
    time_s = np.arange(T) * interval
    comfort_score = jnp.all(ego_is_comfortable(states, time_s), axis=-1).astype(states.dtype)

    multiplicative = no_collision_score * drivable_score
    raw_progress = progress_raw * multiplicative
    max_raw = jnp.max(raw_progress)
    normalized_progress = jnp.where(
        max_raw > config.progress_distance_threshold,
        raw_progress / jnp.maximum(max_raw, 1e-12),
        jnp.where(multiplicative == 0.0, 0.0, 1.0),
    )

    # Weight vector and metric stack are both laid out by WeightedMetricIndex
    # order so the enum and the aggregation cannot drift apart.
    weights = jnp.zeros(WeightedMetricIndex.size())
    weights = weights.at[WeightedMetricIndex.PROGRESS].set(config.progress_weight)
    weights = weights.at[WeightedMetricIndex.TTC].set(config.ttc_weight)
    weights = weights.at[WeightedMetricIndex.COMFORTABLE].set(config.comfortable_weight)
    weights = weights.at[WeightedMetricIndex.DRIVING_DIRECTION].set(config.driving_direction_weight)
    metrics = jnp.zeros((WeightedMetricIndex.size(), B), dtype=normalized_progress.dtype)
    metrics = metrics.at[WeightedMetricIndex.PROGRESS].set(normalized_progress)
    metrics = metrics.at[WeightedMetricIndex.TTC].set(ttc_score)
    metrics = metrics.at[WeightedMetricIndex.COMFORTABLE].set(comfort_score)
    metrics = metrics.at[WeightedMetricIndex.DRIVING_DIRECTION].set(dd_score)
    weighted = (weights[:, None] * metrics).sum(axis=0) / weights.sum()

    final = multiplicative * weighted

    return ScorerOutput(
        score=final,
        no_at_fault_collisions=no_collision_score,
        drivable_area_compliance=drivable_score,
        driving_direction_compliance=dd_score,
        progress_normalized=normalized_progress,
        progress_raw=progress_raw,
        ttc=ttc_score,
        comfort=comfort_score,
        collision_time_idcs=collision_time_idcs,
        ttc_time_idcs=ttc_time_idcs,
    )
