"""Scenario tests for the vectorized PDM scorer + end-to-end pdm_score."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusiondrive_tpu.common.dataclasses import Trajectory, TrajectorySampling
from diffusiondrive_tpu.common.enums import StateIndex
from diffusiondrive_tpu.evaluate.metric_cache import MetricCache
from diffusiondrive_tpu.evaluate.observation import DrivableAreaArrays, MapLayer, TrackArrays
from diffusiondrive_tpu.evaluate.pdm_score import batched_pdm_score, pdm_score
from diffusiondrive_tpu.evaluate.scorer import PDMScorerConfig, score_proposals
from diffusiondrive_tpu.evaluate.simulator import PDMSimulator

S = StateIndex
SAMPLING = TrajectorySampling(num_poses=40, interval_length=0.1)
T = 41
NUM_LOCAL = 26  # ceil((40 + 10) / 2) + 1


def straight_states(v, n=T, dt=0.1, y=0.0):
    states = np.zeros((n, S.size()), np.float32)
    states[:, S.X] = v * dt * np.arange(n)
    states[:, S.Y] = y
    states[:, S.VELOCITY_X] = v
    return states


def make_tracks(boxes=(), red_lights=(), stopped=(), velocities=None, num_objects=4):
    """boxes: list of (x, y, heading, l, w). All static unless velocities given."""
    O = num_objects
    poses = np.full((NUM_LOCAL, O, 3), 1e6, np.float32)
    poses[..., 2] = 0.0
    extents = np.ones((O, 2), np.float32)
    valid = np.zeros(O, bool)
    headings = np.zeros(O, np.float32)
    is_stopped = np.ones(O, bool)
    is_red = np.zeros(O, bool)

    velocities = velocities or [(0.0, 0.0)] * len(boxes)
    for o, box in enumerate(boxes):
        x, y, h, l, w = box
        vx, vy = velocities[o]
        valid[o] = True
        headings[o] = h
        is_stopped[o] = np.hypot(vx, vy) <= 5e-2
        is_red[o] = o in red_lights
        extents[o] = (l, w)
        for li in range(NUM_LOCAL):
            t = li * 2 * 0.1
            poses[li, o] = (x + vx * t, y + vy * t, h)

    return TrackArrays(
        poses=poses,
        extents=extents,
        valid=valid,
        headings=headings,
        is_agent=valid.copy(),
        is_red_light=is_red,
        is_stopped=is_stopped,
        previously_collided=np.zeros(O, bool),
        global_to_local=np.array([i // 2 for i in range(52)], np.int32),
    )


def make_drivable(width=16.0, length=220.0, num_pad=4, ring_pad=8):
    """A straight corridor: one big roadblock + one on-route lane, both
    spanning x in [-20, length], y in [-width/2, width/2]."""
    P = num_pad
    polygons = np.full((P, ring_pad, 2), 1e6, np.float32)
    valid = np.zeros(P, bool)
    layers = np.zeros(P, np.int32)
    on_route = np.zeros(P, bool)

    rect = np.array(
        [[-20, -width / 2], [length, -width / 2], [length, width / 2], [-20, width / 2]], np.float32
    )
    for i, (layer, route) in enumerate([(MapLayer.ROADBLOCK, False), (MapLayer.LANE, True)]):
        polygons[i, :4] = rect
        polygons[i, 4:] = rect[3]
        valid[i] = True
        layers[i] = layer
        on_route[i] = route
    return DrivableAreaArrays(polygons=polygons, valid=valid, layers=layers, on_route=on_route)


def centerline():
    x = np.linspace(-20, 220, 121)
    return np.stack([x, np.zeros_like(x)], axis=-1).astype(np.float32)


def run_scorer(states, tracks, drivable, cl=None):
    t, d = tracks, drivable
    return score_proposals(
        jnp.asarray(states),
        jnp.asarray(t.poses), jnp.asarray(t.extents), jnp.asarray(t.valid),
        jnp.asarray(t.is_agent), jnp.asarray(t.is_red_light), jnp.asarray(t.is_stopped),
        jnp.asarray(t.previously_collided), jnp.asarray(t.global_to_local),
        jnp.asarray(d.polygons), jnp.asarray(d.valid), jnp.asarray(d.layers), jnp.asarray(d.on_route),
        jnp.asarray(cl if cl is not None else centerline()),
        SAMPLING,
    )


def test_clean_drive_scores_one():
    states = np.stack([straight_states(10.0), straight_states(10.0)])
    out = run_scorer(states, make_tracks(), make_drivable())
    np.testing.assert_allclose(np.asarray(out.no_at_fault_collisions), 1.0)
    np.testing.assert_allclose(np.asarray(out.drivable_area_compliance), 1.0)
    np.testing.assert_allclose(np.asarray(out.ttc), 1.0)
    np.testing.assert_allclose(np.asarray(out.comfort), 1.0)
    np.testing.assert_allclose(np.asarray(out.driving_direction_compliance), 1.0)
    np.testing.assert_allclose(np.asarray(out.score), 1.0, atol=1e-5)


def test_collision_with_stopped_vehicle_ahead():
    # stopped vehicle 20 m ahead in lane; ego drives 10 m/s straight into it
    tracks = make_tracks(boxes=[(20.0, 0.0, 0.0, 4.5, 2.0)])
    states = np.stack([straight_states(10.0), straight_states(10.0)])
    out = run_scorer(states, tracks, make_drivable())
    np.testing.assert_allclose(np.asarray(out.no_at_fault_collisions), 0.0)
    np.testing.assert_allclose(np.asarray(out.score), 0.0, atol=1e-6)
    assert np.asarray(out.collision_time_idcs)[0] < np.inf
    # TTC infraction must trigger before the collision itself
    assert np.asarray(out.ttc)[0] == 0.0
    assert np.asarray(out.ttc_time_idcs)[0] <= np.asarray(out.collision_time_idcs)[0]


def test_red_light_tokens_are_ignored_for_collision():
    tracks = make_tracks(boxes=[(20.0, 0.0, 0.0, 4.5, 2.0)], red_lights=(0,))
    states = np.stack([straight_states(10.0), straight_states(10.0)])
    out = run_scorer(states, tracks, make_drivable())
    np.testing.assert_allclose(np.asarray(out.no_at_fault_collisions), 1.0)
    np.testing.assert_allclose(np.asarray(out.ttc), 1.0)


def test_rear_collision_not_at_fault():
    # moving vehicle approaches ego from behind and rear-ends the slow ego
    tracks = make_tracks(
        boxes=[(-15.0, 0.0, 0.0, 4.5, 2.0)], velocities=[(12.0, 0.0)]
    )
    states = np.stack([straight_states(2.0), straight_states(2.0)])
    out = run_scorer(states, tracks, make_drivable())
    np.testing.assert_allclose(np.asarray(out.no_at_fault_collisions), 1.0)


def test_offroad_zeroes_drivable_compliance():
    offroad = straight_states(10.0, y=30.0)  # outside the 16 m corridor
    states = np.stack([straight_states(10.0), offroad])
    out = run_scorer(states, make_tracks(), make_drivable())
    np.testing.assert_allclose(np.asarray(out.drivable_area_compliance), [1.0, 0.0])
    np.testing.assert_allclose(np.asarray(out.score)[1], 0.0, atol=1e-6)


def test_progress_normalization():
    states = np.stack([straight_states(10.0), straight_states(5.0)])
    out = run_scorer(states, make_tracks(), make_drivable())
    raw = np.asarray(out.progress_raw)
    assert raw[0] == pytest.approx(40.0, abs=1.0)
    assert raw[1] == pytest.approx(20.0, abs=1.0)
    np.testing.assert_allclose(np.asarray(out.progress_normalized), [1.0, raw[1] / raw[0]], atol=0.02)


def test_end_to_end_pdm_score():
    cache = MetricCache(
        token="tok0",
        log_name="log0",
        pdm_poses=straight_states(10.0)[:, :3].astype(np.float64),
        pdm_times=np.arange(T) * 0.1,
        initial_state=straight_states(10.0)[0].astype(np.float64),
        tracks=make_tracks(),
        drivable=make_drivable(),
        centerline=centerline(),
        route_lane_ids=[],
    )
    # model predicts the same straight drive, in ego frame at 0.5 s
    poses = np.zeros((8, 3), np.float32)
    poses[:, 0] = 10.0 * 0.5 * np.arange(1, 9)
    traj = Trajectory(poses, TrajectorySampling(time_horizon=4, interval_length=0.5))

    simulator = PDMSimulator(SAMPLING)
    result = pdm_score(cache, traj, simulator)
    assert result.score > 0.95, result
    assert result.no_at_fault_collisions == 1.0
    assert result.drivable_area_compliance == 1.0

    # batched: 3 scenes at once
    results = batched_pdm_score([cache] * 3, [traj] * 3, simulator)
    assert len(results) == 3
    for r in results:
        assert r.score == pytest.approx(result.score, abs=1e-6)
