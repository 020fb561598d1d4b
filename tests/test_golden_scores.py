"""Golden regression test: freeze PDM scorer outputs on fixed scenarios.

Guards the numerics-sensitive scorer against silent drift during refactors
(the reference's analogue is the published per-token navtest CSV,
SURVEY §4). If a change intentionally alters scoring, re-derive the values
and justify in the commit message.
"""

import numpy as np

from test_scorer import centerline, make_drivable, make_tracks, run_scorer, straight_states


def test_golden_scenario_scores():
    # proposal 0: clean 10 m/s drive; proposal 1: same but tailgating a lead
    # car; computed once and frozen.
    tracks = make_tracks(boxes=[(12.0, 0.0, 0.0, 4.5, 2.0)], velocities=[(9.0, 0.0)])
    states = np.stack([straight_states(10.0), straight_states(10.0)])
    out = run_scorer(states, tracks, make_drivable())

    np.testing.assert_allclose(np.asarray(out.no_at_fault_collisions), [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(out.drivable_area_compliance), [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(out.ttc), [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(out.comfort), [1.0, 1.0])
    # progress: 40 m raw for both, normalized to 1.0
    np.testing.assert_allclose(np.asarray(out.progress_raw), [40.0, 40.0], atol=0.05)
    np.testing.assert_allclose(np.asarray(out.progress_normalized), [1.0, 1.0], atol=1e-6)
    # final = 1.0 * (1.0*5 + 0.0*5 + 1.0*2 + 1.0*0) / 12
    np.testing.assert_allclose(np.asarray(out.score), [7.0 / 12.0] * 2, atol=1e-5)
    # TTC triggers at the last step: closing speed 1 m/s, 0.9 s projection;
    # ego front at t=4.0 projected 9 m ahead overlaps the lead's rear by 0.1 m
    np.testing.assert_allclose(np.asarray(out.ttc_time_idcs), [40.0, 40.0])


def test_golden_crash_scenario():
    tracks = make_tracks(boxes=[(20.0, 0.0, 0.0, 4.5, 2.0)])  # parked car
    states = np.stack([straight_states(10.0), straight_states(2.0)])
    out = run_scorer(states, tracks, make_drivable())

    # fast proposal crashes (stopped-track collision at fault)
    assert float(np.asarray(out.no_at_fault_collisions)[0]) == 0.0
    np.testing.assert_allclose(np.asarray(out.collision_time_idcs)[0], 14.0)  # front reaches the car rear at t=1.4s
    assert float(np.asarray(out.score)[0]) == 0.0
    # slow proposal (2 m/s, 8 m travelled) never reaches the car
    assert float(np.asarray(out.no_at_fault_collisions)[1]) == 1.0
    assert float(np.asarray(out.ttc)[1]) == 1.0
    # its progress normalizes against the crashed proposal's zeroed progress
    np.testing.assert_allclose(np.asarray(out.progress_raw)[1], 8.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(out.score)[1], 1.0, atol=1e-5)
