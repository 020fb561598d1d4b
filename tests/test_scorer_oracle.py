"""Analytic oracle tests for the PDM scorer.

Unlike the frozen-golden tests, every expected value here is derived by hand
(closed-form geometry over the Pacifica footprint: rear-axle -> front bumper
4.049 m, rear bumper 1.127 m, half-width 1.1485 m), so a wrong-from-day-one
metric cannot self-confirm. Scenario semantics follow the reference scorer:
collision typing `pdm_scorer_utils.py:13-68`, first-event-ignore lists
`pdm_scorer.py:293-349,414-498`, progress<5m branch `pdm_scorer.py:156-183`,
oncoming tiers `pdm_scorer.py:360-396`.
"""

import numpy as np
import pytest

from diffusiondrive_tpu.evaluate.observation import DrivableAreaArrays, MapLayer

from test_scorer import (
    SAMPLING,
    T,
    centerline,
    make_drivable,
    make_tracks,
    run_scorer,
    straight_states,
)

# Pacifica footprint from the rear axle (evaluate/vehicle.py)
FRONT = 4.049   # rear axle -> front bumper
REAR = 1.127    # rear axle -> rear bumper
HALF_W = 1.1485


def two_lane_drivable(split_y=0.0, width=8.0, length=220.0, on_route=(True, True)):
    """Two adjacent lanes split at `split_y` + one roadblock covering both."""
    P, ring_pad = 4, 8
    polygons = np.full((P, ring_pad, 2), 1e6, np.float32)
    valid = np.zeros(P, bool)
    layers = np.zeros(P, np.int32)
    route = np.zeros(P, bool)

    def rect(y0, y1):
        return np.array([[-20, y0], [length, y0], [length, y1], [-20, y1]], np.float32)

    specs = [
        (rect(split_y - width, split_y + width), MapLayer.ROADBLOCK, False),
        (rect(split_y - width, split_y), MapLayer.LANE, on_route[0]),
        (rect(split_y, split_y + width), MapLayer.LANE, on_route[1]),
    ]
    for i, (poly, layer, rt) in enumerate(specs):
        polygons[i, :4] = poly
        polygons[i, 4:] = poly[3]
        valid[i] = True
        layers[i] = layer
        route[i] = rt
    return DrivableAreaArrays(polygons=polygons, valid=valid, layers=layers, on_route=route)


# --------------------------------------------------------------------------- #
# Collision typing: all five reference types
# --------------------------------------------------------------------------- #


def test_stopped_ego_collision_not_at_fault():
    """Ego stationary; a moving agent drives into it -> STOPPED_EGO -> score 1.

    Track: 4m box at x0=8 driving at -5 m/s reaches ego's front bumper
    (x=4.049) at t = (8-2-4.049)/5 = 0.39 s -> they definitely collide.
    """
    states = straight_states(0.0)[None]
    tracks = make_tracks(boxes=[(8.0, 0.0, np.pi, 4.0, 2.0)], velocities=[(-5.0, 0.0)])
    out = run_scorer(states, tracks, make_drivable())
    assert float(out.no_at_fault_collisions[0]) == 1.0
    # stationary ego (speed < 5e-3) generates no TTC events either
    assert float(out.ttc[0]) == 1.0
    # raw progress 0 < 5m and multiplicative == 1 -> normalized progress = 1
    assert float(out.progress_normalized[0]) == 1.0
    assert float(out.score[0]) == 1.0


def test_stopped_track_collision_exact_time():
    """Ego at 10 m/s hits a stopped agent box [18, 22] -> at fault, score 0.

    Front bumper x(t) = 10t + 4.049 crosses 18 at t=1.3951 -> first
    intersecting sample index 14 (x_front(1.4)=18.049). TTC projects the ring
    up to 0.9 s ahead: 10t + 4.049 + 9 >= 18 at t=0.4951 -> index 5.
    """
    states = straight_states(10.0)[None]
    tracks = make_tracks(boxes=[(20.0, 0.0, 0.0, 4.0, 2.0)])
    out = run_scorer(states, tracks, make_drivable())
    assert float(out.no_at_fault_collisions[0]) == 0.0
    assert int(out.collision_time_idcs[0]) == 14
    assert float(out.ttc[0]) == 0.0
    assert int(out.ttc_time_idcs[0]) == 5
    assert float(out.score[0]) == 0.0


def test_stopped_track_object_half_penalty_exact_score():
    """Same crash into a non-agent object -> 0.5, final score = 0.5 * 7/12.

    Weighted: progress (max raw = 40*0.5 = 20 > 5 -> normalized 1) * 5
    + ttc 0 * 5 + comfort 1 * 2, over sum 12.
    """
    states = straight_states(10.0)[None]
    tracks = make_tracks(boxes=[(20.0, 0.0, 0.0, 4.0, 2.0)])
    tracks.is_agent[:] = False
    out = run_scorer(states, tracks, make_drivable())
    assert float(out.no_at_fault_collisions[0]) == 0.5
    np.testing.assert_allclose(float(out.score[0]), 0.5 * 7.0 / 12.0, atol=1e-6)


def test_active_front_collision_exact_time():
    """Ego at 10 m/s rear-ends a slow (1 m/s) agent -> ACTIVE_FRONT, at fault.

    Box [x+18, x+22] moving at 1 m/s: 10t + 4.049 >= 18 + t at t=1.5501
    -> first intersecting sample 16.
    """
    states = straight_states(10.0)[None]
    tracks = make_tracks(boxes=[(20.0, 0.0, 0.0, 4.0, 2.0)], velocities=[(1.0, 0.0)])
    out = run_scorer(states, tracks, make_drivable())
    assert float(out.no_at_fault_collisions[0]) == 0.0
    assert int(out.collision_time_idcs[0]) == 16


def test_active_lateral_collision_single_lane_not_at_fault():
    """A moving agent squeezes into ego's side: bearing 90 deg (not ahead, not
    behind), no front-bumper-segment intersection -> ACTIVE_LATERAL. In a
    single lane on drivable area that is NOT at fault.

    Track box (l=4, w=2) centered at ego's rear-axle x, y=2.05: occupies
    y in [1.05, 3.05], ego side at y=1.1485 -> overlap from t=0; box x-range
    [x-2, x+2] never reaches the front bumper line x+4.049.
    """
    states = straight_states(10.0)[None]
    tracks = make_tracks(boxes=[(0.0, 2.05, 0.0, 4.0, 2.0)], velocities=[(10.0, 0.0)])
    out = run_scorer(states, tracks, make_drivable())
    assert float(out.no_at_fault_collisions[0]) == 1.0


def test_active_lateral_collision_in_multiple_lanes_at_fault():
    """The same lateral squeeze while ego straddles two lanes -> at fault.

    Lanes split at y=0; ego corners at y=+-1.1485 sit in different lanes and
    no lane contains all four -> EgoAreaIndex.MULTIPLE_LANES -> lateral
    collision becomes at-fault (reference `pdm_scorer.py:337-343`).
    """
    states = straight_states(10.0)[None]
    tracks = make_tracks(boxes=[(0.0, 2.05, 0.0, 4.0, 2.0)], velocities=[(10.0, 0.0)])
    out = run_scorer(states, tracks, two_lane_drivable(split_y=0.0))
    assert float(out.no_at_fault_collisions[0]) == 0.0
    assert int(out.collision_time_idcs[0]) == 0


def test_active_rear_collision_not_at_fault():
    """A faster agent rear-ends ego -> ACTIVE_REAR -> not at fault.

    Track (l=4) behind at x0=-8 doing 15 m/s vs ego 5 m/s: front of track
    15t - 6 reaches ego rear 5t - 1.127 at t=0.4873 -> overlap from sample 5;
    bearing from ego rear axle to track center is 180 deg (behind).
    """
    states = straight_states(5.0)[None]
    tracks = make_tracks(boxes=[(-8.0, 0.0, 0.0, 4.0, 2.0)], velocities=[(15.0, 0.0)])
    out = run_scorer(states, tracks, make_drivable())
    assert float(out.no_at_fault_collisions[0]) == 1.0
    assert np.isinf(float(out.collision_time_idcs[0]))


# --------------------------------------------------------------------------- #
# TTC first-event-ignore semantics
# --------------------------------------------------------------------------- #


def test_ttc_nonfault_first_event_ignores_later_at_fault_hits():
    """Reference `_calculate_ttc` appends a token to the ignore list at its
    first non-at-fault event; later at-fault hits of the same track must NOT
    zero TTC.

    A car squeezed against ego's left side (center bearing exactly 90 deg at
    t=0 -> lateral, single lane -> non-at-fault) pulls ahead at +2 m/s; by
    t=2 its center bearing is ~21 deg (< 30 -> `is_agent_ahead`) while still
    overlapping ego's projected rings — a non-sequential scorer would zero
    TTC, the reference (and ours) must not.
    """
    states = straight_states(10.0)[None]
    tracks = make_tracks(boxes=[(0.0, 2.05, 0.0, 4.0, 2.0)], velocities=[(12.0, 0.0)])

    # sanity of the scenario: at t=2 the track *is* ahead of ego and overlaps
    t = 2.0
    track_center = np.array([12.0 * t, 2.05])
    ego_pose = np.array([10.0 * t, 0.0])
    bearing = np.arctan2(track_center[1] - ego_pose[1], track_center[0] - ego_pose[0])
    assert abs(np.rad2deg(bearing)) < 30.0
    assert track_center[0] - 2.0 < ego_pose[0] + FRONT  # overlaps even unprojected

    out = run_scorer(states, tracks, make_drivable())
    assert float(out.ttc[0]) == 1.0
    assert np.isinf(float(out.ttc_time_idcs[0]))
    assert float(out.no_at_fault_collisions[0]) == 1.0  # lateral, single lane


# --------------------------------------------------------------------------- #
# Progress
# --------------------------------------------------------------------------- #


def test_progress_raw_exact_straight_drive():
    """10 m/s for 4 s -> box center advances exactly 40 m along the
    centerline (center offset rear_axle_to_center cancels)."""
    states = straight_states(10.0)[None]
    out = run_scorer(states, make_tracks(), make_drivable())
    np.testing.assert_allclose(float(out.progress_raw[0]), 40.0, atol=1e-2)
    np.testing.assert_allclose(float(out.progress_normalized[0]), 1.0)


def test_progress_below_threshold_branch():
    """max raw progress < 5 m: normalized progress = 1 everywhere except
    proposals whose multiplicative score is 0 (`pdm_scorer.py:168-175`).

    Both proposals crawl at 0.5 m/s (raw 2 m). B (y=5) starts inside a
    stopped agent -> multiplicative 0 -> progress 0 and final score 0;
    A stays clean -> progress 1 and final score exactly 1.
    """
    states = np.stack([straight_states(0.5), straight_states(0.5, y=5.0)])
    tracks = make_tracks(boxes=[(2.0, 5.0, 0.0, 4.0, 2.0)])
    out = run_scorer(states, tracks, make_drivable())
    np.testing.assert_allclose(np.asarray(out.progress_raw), [2.0, 2.0], atol=1e-2)
    np.testing.assert_allclose(np.asarray(out.progress_normalized), [1.0, 0.0])
    np.testing.assert_allclose(np.asarray(out.no_at_fault_collisions), [1.0, 0.0])
    np.testing.assert_allclose(np.asarray(out.score), [1.0, 0.0], atol=1e-6)


# --------------------------------------------------------------------------- #
# Driving direction tiers
# --------------------------------------------------------------------------- #


def test_driving_direction_compliance_tiers():
    """Ego in an oncoming (not-on-route) lane. The 1 s window holds 11
    per-sample distances -> max oncoming progress = 1.1 * v:
    v=1.5 -> 1.65 m < 2 (1.0); v=3 -> 3.3 m in [2, 6) (0.5);
    v=8 -> 8.8 m >= 6 (0.0). Reference `pdm_scorer.py:377-396`.
    """
    states = np.stack([straight_states(1.5), straight_states(3.0), straight_states(8.0)])
    drivable = two_lane_drivable(split_y=4.0, on_route=(False, False))
    out = run_scorer(states, make_tracks(), drivable)
    np.testing.assert_allclose(np.asarray(out.driving_direction_compliance), [1.0, 0.5, 0.0])
    # driving direction is weighted with weight 0 -> even the 0.0 tier does
    # not change the score: the fastest proposal (progress 1) still scores 1
    assert float(out.score[2]) == 1.0
