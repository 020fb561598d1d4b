"""Array-native evaluation context: occupancy forecast + drivable map.

Replaces the object-graph `PDMObservation`/`PDMOccupancyMap`/`PDMDrivableMap`
(`pdm_planner/observation/*.py`) with padded, fixed-shape arrays so the whole
scorer jits and vmaps over scenes:

- tracks: one oriented polygon per (local timestep, object) with validity
  masks and per-object attributes (agent type, stopped, red-light, previously
  collided). Dynamic objects are forecast at constant velocity; red-light
  lane-connector polygons are static over the horizon
  (`pdm_observation.py:166-189`).
- drivable map: padded polygon rings with semantic-layer ids and an on-route
  lane mask (`pdm_occupancy_map.py:119-223`).

The `time index -> local map` subsampling (one occupancy map per
`observation_sample_res`=2 samples) is kept as an index table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from diffusiondrive_tpu.common.dataclasses import TrajectorySampling


class MapLayer:
    """Semantic map layers used by the scorer (subset of nuplan's)."""

    LANE = 0
    LANE_CONNECTOR = 1
    ROADBLOCK = 2
    ROADBLOCK_CONNECTOR = 3
    INTERSECTION = 4
    DRIVABLE_AREA = 5
    CARPARK_AREA = 6
    WALKWAYS = 7
    CROSSWALK = 8

    DRIVABLE = (ROADBLOCK, INTERSECTION, DRIVABLE_AREA, CARPARK_AREA)
    DRIVABLE_LANES = (LANE, LANE_CONNECTOR)


@dataclass
class TrackArrays:
    """Padded per-object occupancy forecast.

    Shapes: L = number of local occupancy maps, O = max objects, V = ring pad.
    """

    polygons: np.ndarray          # (L, O, V, 2) float32 rings (pad: repeat last vertex)
    valid: np.ndarray             # (O,) bool — object exists
    centers: np.ndarray           # (L, O, 2) float32 polygon centers over time
    headings: np.ndarray          # (O,) float32 box heading (current frame)
    is_agent: np.ndarray          # (O,) bool — AGENT_TYPES (vehicle/ped/bicycle)
    is_red_light: np.ndarray      # (O,) bool
    is_stopped: np.ndarray        # (O,) bool — track speed <= 5e-2 m/s
    previously_collided: np.ndarray  # (O,) bool — collision at t=0, ignored
    global_to_local: np.ndarray   # (T_global,) int — time idx -> local map idx
    speeds: np.ndarray = None     # (O,) float32 current speed (leading-agent search)

    def __post_init__(self):
        if self.speeds is None:
            self.speeds = np.zeros(self.polygons.shape[1], np.float32)

    @property
    def num_objects(self) -> int:
        return self.polygons.shape[1]


@dataclass
class DrivableAreaArrays:
    """Padded drivable-area map polygons."""

    polygons: np.ndarray    # (P, V, 2) float32 rings
    valid: np.ndarray       # (P,) bool
    layers: np.ndarray      # (P,) int32 MapLayer ids
    on_route: np.ndarray    # (P,) bool — lane/lane-connector on the route


@dataclass
class ScoringContext:
    """Everything `score_proposals` needs for one scene, as arrays."""

    tracks: TrackArrays
    drivable: DrivableAreaArrays
    centerline: np.ndarray        # (Lc, 2) float32 polyline
    initial_state: np.ndarray     # (11,) ego state array at t=0


def pad_rings(rings: List[np.ndarray], max_vertices: int) -> np.ndarray:
    """Stack variable-length rings into (N, V, 2), repeating the last vertex.

    Rings longer than `max_vertices` are decimated by uniform subsampling
    (keeps endpoints; acceptable for map polygons at scorer tolerance).
    """
    out = np.zeros((len(rings), max_vertices, 2), dtype=np.float32)
    for i, ring in enumerate(rings):
        ring = np.asarray(ring, dtype=np.float32)
        # drop an explicit closing vertex
        if len(ring) > 1 and np.allclose(ring[0], ring[-1]):
            ring = ring[:-1]
        if len(ring) > max_vertices:
            idx = np.linspace(0, len(ring) - 1, max_vertices).round().astype(int)
            ring = ring[idx]
        out[i, : len(ring)] = ring
        out[i, len(ring) :] = ring[-1] if len(ring) else 0.0
    return out


def constant_velocity_forecast(
    boxes: np.ndarray,            # (O, 5): x, y, heading, length, width (current frame, global)
    velocities: np.ndarray,       # (O, 2): global-frame vx, vy
    is_dynamic: np.ndarray,       # (O,) bool — propagate only dynamic agents
    valid: np.ndarray,            # (O,) bool
    trajectory_sampling: TrajectorySampling,
    observation_samples: int,
    sample_res: int = 2,
    ring_pad: int = 8,
) -> tuple:
    """Constant-velocity occupancy forecast (`pdm_observation.py:166-189`).

    Static objects stay frozen; dynamic agents translate by v * t. One local
    map per `sample_res` samples, each representing time (local_idx *
    sample_res * interval).
    :return: (polygons (L, O, V, 2), centers (L, O, 2), global_to_local)
    """
    from diffusiondrive_tpu.evaluate.state_array import box_to_corners

    interval = trajectory_sampling.interval_length
    num_local = observation_samples // sample_res + 1
    global_to_local = np.array(
        [idx // sample_res for idx in range(observation_samples + sample_res)], dtype=np.int32
    )

    O = boxes.shape[0]
    corners0 = box_to_corners(boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], boxes[:, 4])  # (O, 4, 2)
    polygons = np.zeros((num_local, O, ring_pad, 2), dtype=np.float32)
    centers = np.zeros((num_local, O, 2), dtype=np.float32)

    for local_idx in range(num_local):
        t = local_idx * sample_res * interval
        delta = np.where(is_dynamic[:, None], velocities * t, 0.0)  # (O, 2)
        c = corners0 + delta[:, None, :]
        polygons[local_idx, :, :4] = c
        polygons[local_idx, :, 4:] = c[:, 3:4]  # pad with last vertex
        centers[local_idx] = boxes[:, :2] + delta
    return polygons, centers, global_to_local
