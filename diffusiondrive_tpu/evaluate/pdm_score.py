"""PDM-Score orchestration: trajectory transform + simulate + score.

Parity: `navsim/evaluate/pdm_score.py` — an agent trajectory (8 ego-frame
poses at 0.5 s) is moved to the global frame, interpolated to 41 states at
10 Hz alongside the cached PDM-Closed trajectory, both are re-simulated
through the LQR-tracked bicycle model, and the closed-loop metric suite is
scored; sub-scores are reported for the prediction.

TPU shape: per scene the proposal dim is 2 (pdm, pred). `batched_pdm_score`
stacks S scenes into (S, 2, 41, 11) + stacked context arrays and runs ONE
jitted vmap over scenes — the reference's per-token Ray tasks become a batch
dimension. Pass a `jax.sharding.Mesh` to shard that scene dimension over the
`data` axis (ICI): the SPMD partitioner splits both the simulate scan and the
polygon-test score program across every chip of the slice, replacing the
reference's Ray fan-out (`run_pdm_score.py:134-142`) with collectives-free
batch parallelism (each scene is independent — no cross-chip traffic at all).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from diffusiondrive_tpu.common.dataclasses import PDMResults, Trajectory, TrajectorySampling
from diffusiondrive_tpu.common.enums import StateIndex
from diffusiondrive_tpu.common.geometry import (
    convert_relative_to_absolute_se2_array,
    normalize_angle,
)
from diffusiondrive_tpu.evaluate.metric_cache import MetricCache
from diffusiondrive_tpu.evaluate.scorer import PDMScorerConfig, ScorerOutput, score_proposals
from diffusiondrive_tpu.evaluate.simulator import PDMSimulator


def interpolate_poses(poses: np.ndarray, times: np.ndarray, query_times: np.ndarray) -> np.ndarray:
    """Linear pose interpolation with unwrapped headings.

    :param poses: (M, 3) poses at `times`
    :param query_times: (Q,) times to sample (clipped to the pose range)
    :return: (Q, 3)
    """
    q = np.clip(query_times, times[0], times[-1])
    x = np.interp(q, times, poses[:, 0])
    y = np.interp(q, times, poses[:, 1])
    h = np.interp(q, times, np.unwrap(poses[:, 2]))
    return np.stack([x, y, normalize_angle(h)], axis=-1)


def transform_trajectory_to_states(
    model_trajectory: Trajectory,
    initial_state: np.ndarray,
    simulation_sampling: TrajectorySampling,
) -> np.ndarray:
    """Ego-frame trajectory -> (N+1, 11) global state array at 10 Hz.

    Mirrors `transform_trajectory` + `get_trajectory_as_array`: the current
    ego state is prepended at t=0; velocities/accelerations are left zero for
    future poses (the LQR profile fit only consumes poses).
    """
    sampling = model_trajectory.trajectory_sampling
    rel_times = np.arange(1, sampling.num_poses + 1) * sampling.interval_length
    abs_poses = convert_relative_to_absolute_se2_array(
        initial_state[StateIndex.STATE_SE2], np.asarray(model_trajectory.poses, dtype=np.float64)
    )
    all_poses = np.concatenate([initial_state[None, StateIndex.STATE_SE2], abs_poses], axis=0)
    all_times = np.concatenate([[0.0], rel_times])

    query = np.arange(simulation_sampling.num_poses + 1) * simulation_sampling.interval_length
    poses_10hz = interpolate_poses(all_poses, all_times, query)

    states = np.zeros((len(query), StateIndex.size()), dtype=np.float64)
    states[:, StateIndex.STATE_SE2] = poses_10hz
    states[0] = initial_state
    return states


def pdm_states_from_cache(metric_cache: MetricCache, simulation_sampling: TrajectorySampling) -> np.ndarray:
    """Cached PDM-Closed trajectory -> (N+1, 11) state array at 10 Hz."""
    query = np.arange(simulation_sampling.num_poses + 1) * simulation_sampling.interval_length
    poses = interpolate_poses(metric_cache.pdm_poses, metric_cache.pdm_times, query)
    states = np.zeros((len(query), StateIndex.size()), dtype=np.float64)
    states[:, StateIndex.STATE_SE2] = poses
    states[0] = metric_cache.initial_state
    return states


def pad_polyline(coords: np.ndarray, multiple: int = 256) -> np.ndarray:
    """Pad a polyline to the next length bucket by repeating its last vertex.

    Centerline length varies per scene (graph-search route length), which
    would recompile the jitted score program on every call. Bucketing to
    multiples of `multiple` caps the number of distinct compiles at a handful
    per dataset. Repeated-vertex padding is exact for the scorer: the padded
    zero-length segments add nothing to the arc-length table and can never
    win the nearest-segment argmin (`geometry.project_onto_polyline`).
    """
    L = len(coords)
    target = max(multiple, -(-L // multiple) * multiple)
    if target == L:
        return coords
    return np.concatenate([coords, np.repeat(coords[-1:], target - L, axis=0)], axis=0)


def _shardings(mesh: Optional[Mesh]):
    """(in_kwargs) batch-sharding jit kwargs for a scene-batched program."""
    if mesh is None:
        return {}
    from diffusiondrive_tpu.parallel.mesh import batch_sharding

    return {"in_shardings": batch_sharding(mesh), "out_shardings": batch_sharding(mesh)}


@functools.lru_cache(maxsize=8)
def _jitted_simulate(simulator: PDMSimulator, mesh: Optional[Mesh] = None):
    return jax.jit(jax.vmap(simulator.simulate_proposals), **_shardings(mesh))


@functools.lru_cache(maxsize=8)
def _jitted_score(simulator: PDMSimulator, scorer_config: PDMScorerConfig,
                  mesh: Optional[Mesh] = None):
    def score_one(simulated, tracks_poses, tracks_extents, tracks_valid, tracks_is_agent,
                  tracks_is_red_light, tracks_is_stopped, tracks_previously_collided,
                  global_to_local, map_polygons, map_valid, map_layers, map_on_route, centerline):
        return score_proposals(
            simulated,
            tracks_poses, tracks_extents, tracks_valid, tracks_is_agent,
            tracks_is_red_light, tracks_is_stopped, tracks_previously_collided,
            global_to_local, map_polygons, map_valid, map_layers, map_on_route,
            centerline, simulator.proposal_sampling, scorer_config,
        )

    return jax.jit(jax.vmap(score_one), **_shardings(mesh))


def _score_scene(simulator: PDMSimulator, scorer_config: PDMScorerConfig,
                 mesh: Optional[Mesh] = None):
    """Per-scene (simulate + score); NOTE: compile simulate and score as two
    programs — XLA's compile time explodes (~400s vs ~9s) when the 40-step
    simulation scan and the dense polygon-test tensors are fused into one
    vmapped computation."""

    sim_fn = _jitted_simulate(simulator, mesh)
    score_fn = _jitted_score(simulator, scorer_config, mesh)

    def run(proposal_states, initial_state, *ctx):
        simulated = sim_fn(proposal_states, initial_state)
        return score_fn(simulated, *ctx)

    return run


def pdm_score(
    metric_cache: MetricCache,
    model_trajectory: Trajectory,
    simulator: PDMSimulator,
    scorer_config: PDMScorerConfig = PDMScorerConfig(),
) -> PDMResults:
    """Score a single scene (reference-equivalent entry point)."""
    out = batched_pdm_score([metric_cache], [model_trajectory], simulator, scorer_config)
    return out[0]


def batched_pdm_score(
    metric_caches: List[MetricCache],
    model_trajectories: List[Trajectory],
    simulator: PDMSimulator,
    scorer_config: PDMScorerConfig = PDMScorerConfig(),
    mesh: Optional[Mesh] = None,
) -> List[PDMResults]:
    """Score S scenes in one vmapped XLA program.

    All caches must share padded shapes (they do when produced by the same
    caching pipeline config). With a `mesh`, the scene dim is sharded over its
    `data` axis (scenes are padded up to a device-count multiple by repeating
    the last scene; padded rows are dropped from the returned results).
    """
    num_real = len(metric_caches)
    if mesh is not None:
        pad = (-num_real) % mesh.size
        metric_caches = list(metric_caches) + [metric_caches[-1]] * pad
        model_trajectories = list(model_trajectories) + [model_trajectories[-1]] * pad

    sampling = simulator.proposal_sampling
    # centerline lengths differ across caches (route length); bucket-pad to a
    # common bucketed length so the batch stacks and the jit cache stays warm
    # across batches
    cl_bucket = max(256, -(-max(len(c.centerline) for c in metric_caches) // 256) * 256)
    proposals, ctx = [], []
    for cache, traj in zip(metric_caches, model_trajectories):
        pdm_states = pdm_states_from_cache(cache, sampling)
        pred_states = transform_trajectory_to_states(traj, cache.initial_state, sampling)
        proposals.append(np.stack([pdm_states, pred_states]).astype(np.float32))
        t = cache.tracks
        d = cache.drivable
        ctx.append(
            (
                cache.initial_state.astype(np.float32),
                t.poses, t.extents, t.valid, t.is_agent, t.is_red_light, t.is_stopped,
                t.previously_collided, t.global_to_local,
                d.polygons, d.valid, d.layers, d.on_route,
                pad_polyline(cache.centerline.astype(np.float32), cl_bucket),
            )
        )

    stacked = [np.stack(x) for x in zip(*ctx)]
    proposals = np.stack(proposals)  # (S, 2, N+1, 11)

    run = _score_scene(simulator, scorer_config, mesh)
    out = run(jnp.asarray(proposals), *[jnp.asarray(x) for x in stacked])
    # ONE device->host transfer for the whole batch; per-scalar indexing of
    # device arrays would issue thousands of tiny fetches.
    out = ScorerOutput(*jax.device_get(tuple(out)))

    results = []
    pred = 1
    for i in range(num_real):
        results.append(
            PDMResults(
                no_at_fault_collisions=float(out.no_at_fault_collisions[i, pred]),
                drivable_area_compliance=float(out.drivable_area_compliance[i, pred]),
                ego_progress=float(out.progress_normalized[i, pred]),
                time_to_collision_within_bound=float(out.ttc[i, pred]),
                comfort=float(out.comfort[i, pred]),
                driving_direction_compliance=float(out.driving_direction_compliance[i, pred]),
                score=float(out.score[i, pred]),
            )
        )
    return results
