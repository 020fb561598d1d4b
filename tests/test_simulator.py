"""Tests for the batched LQR + kinematic-bicycle re-simulation."""

import numpy as np
import jax
import jax.numpy as jnp

from diffusiondrive_tpu.common.dataclasses import TrajectorySampling
from diffusiondrive_tpu.common.enums import StateIndex
from diffusiondrive_tpu.evaluate.simulator import (
    PDMSimulator,
    velocity_curvature_profiles_from_poses,
)

S = StateIndex
SAMPLING = TrajectorySampling(num_poses=40, interval_length=0.1)


def make_state(x=0.0, y=0.0, heading=0.0, vx=0.0):
    state = np.zeros(S.size())
    state[S.X], state[S.Y], state[S.HEADING], state[S.VELOCITY_X] = x, y, heading, vx
    return state


def straight_proposal(v, n=41, dt=0.1):
    states = np.zeros((1, n, S.size()))
    states[0, :, S.X] = v * dt * np.arange(n)
    states[0, :, S.VELOCITY_X] = v
    return states


def circular_proposal(v, radius, n=41, dt=0.1):
    states = np.zeros((1, n, S.size()))
    omega = v / radius
    t = np.arange(n) * dt
    states[0, :, S.X] = radius * np.sin(omega * t)
    states[0, :, S.Y] = radius * (1 - np.cos(omega * t))
    states[0, :, S.HEADING] = omega * t
    states[0, :, S.VELOCITY_X] = v
    return states


def test_profile_fit_recovers_constant_velocity():
    poses = jnp.asarray(straight_proposal(8.0)[..., :3])
    velocity, curvature = velocity_curvature_profiles_from_poses(poses, 0.1, 1e-4, 1e-2)
    np.testing.assert_allclose(np.asarray(velocity), 8.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(curvature), 0.0, atol=0.01)


def test_profile_fit_recovers_curvature():
    radius = 20.0
    poses = jnp.asarray(circular_proposal(6.0, radius)[..., :3])
    velocity, curvature = velocity_curvature_profiles_from_poses(poses, 0.1, 1e-4, 1e-2)
    np.testing.assert_allclose(np.asarray(velocity), 6.0, atol=0.1)
    # skip the first few samples: the regularized fit smooths the initial transient
    np.testing.assert_allclose(np.asarray(curvature)[:, 5:], 1.0 / radius, atol=0.01)


def test_simulate_tracks_straight_line():
    sim = PDMSimulator(SAMPLING)
    proposal = straight_proposal(10.0)
    init = make_state(vx=10.0)
    rollout = np.asarray(jax.jit(sim.simulate_proposals)(jnp.asarray(proposal), jnp.asarray(init)))

    assert rollout.shape == (1, 41, 11)
    np.testing.assert_allclose(rollout[0, 0], init, atol=1e-6)
    # tracking a feasible trajectory from a matched initial state stays tight
    err = np.abs(rollout[0, :, S.X] - proposal[0, :, S.X])
    assert err.max() < 0.5, err.max()
    assert np.abs(rollout[0, :, S.Y]).max() < 0.1
    assert np.abs(rollout[0, :, S.VELOCITY_X] - 10.0).max() < 0.5


def test_simulate_tracks_curve():
    sim = PDMSimulator(SAMPLING)
    proposal = circular_proposal(6.0, 25.0)
    init = make_state(vx=6.0)
    rollout = np.asarray(jax.jit(sim.simulate_proposals)(jnp.asarray(proposal), jnp.asarray(init)))
    pos_err = np.hypot(
        rollout[0, :, S.X] - proposal[0, :, S.X], rollout[0, :, S.Y] - proposal[0, :, S.Y]
    )
    assert pos_err.max() < 1.0, pos_err.max()


def test_stopped_proposal_stays_stopped():
    sim = PDMSimulator(SAMPLING)
    proposal = straight_proposal(0.0)
    init = make_state(vx=0.0)
    rollout = np.asarray(jax.jit(sim.simulate_proposals)(jnp.asarray(proposal), jnp.asarray(init)))
    assert np.abs(rollout[0, :, S.VELOCITY_X]).max() < 0.05
    assert np.abs(rollout[0, :, S.X]).max() < 0.05


def test_infeasible_jump_is_smoothed():
    """The bicycle model cannot teleport: a discontinuous proposal yields a
    dynamically feasible (bounded accel) rollout."""
    sim = PDMSimulator(SAMPLING)
    proposal = straight_proposal(5.0)
    proposal[0, 20:, S.Y] += 20.0  # 20 m lateral jump
    init = make_state(vx=5.0)
    rollout = np.asarray(jax.jit(sim.simulate_proposals)(jnp.asarray(proposal), jnp.asarray(init)))
    step_dist = np.hypot(np.diff(rollout[0, :, S.X]), np.diff(rollout[0, :, S.Y]))
    assert step_dist.max() < 2.0  # <= 20 m/s equivalent; no teleporting
    assert np.isfinite(rollout).all()
