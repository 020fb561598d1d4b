"""Differential tests against the reference's own importable numerics.

The strongest parity evidence obtainable without real data: import the
reference modules directly from /root/reference (they are pure numpy/scipy/
torch) and assert our JAX implementations match on randomized batches.

Covered reference modules (all under
`navsim/planning/simulation/planner/pdm_planner/`):
- `scoring/pdm_comfort_metrics.py` (imports clean; savgol comfort suite)
- `simulation/batch_lqr_utils.py` (velocity/curvature profile fits)
- `simulation/batch_lqr.py` (the FULL BatchLQRTracker: per-step
  accel/steering-rate commands incl. the stopping branch, and the complete
  41-step tracked rollout vs reference-tracker-plus-reference-bicycle)
- `simulation/batch_kinematic_bicycle.py` (rear-axle bicycle propagate)
- `proposal/batch_idm_policy.py` (vectorized IDM ODE)

The LQR/bicycle modules import `nuplan` symbols only for type hints, vehicle
parameters, and `principal_value`; a ~50-line stub (public Pacifica spec,
standard angle wrap) unlocks them. No reference *code* is executed except the
modules under test.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE_ROOT = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE_ROOT / "navsim").is_dir(), reason="reference checkout not mounted"
)


# --------------------------------------------------------------------------- #
# Minimal nuplan stub (only what the four modules import)
# --------------------------------------------------------------------------- #


def _install_nuplan_stub() -> None:
    if "nuplan" in sys.modules:  # stub (or real package) already loaded
        return
    if importlib.util.find_spec("nuplan") is not None:  # real nuplan present
        return

    def mod(name: str) -> types.ModuleType:
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    nuplan = mod("nuplan")
    common = mod("nuplan.common")
    actor_state = mod("nuplan.common.actor_state")
    geometry = mod("nuplan.common.geometry")
    planning = mod("nuplan.planning")
    sim = mod("nuplan.planning.simulation")
    stc = mod("nuplan.planning.simulation.simulation_time_controller")

    state_repr = mod("nuplan.common.actor_state.state_representation")

    class StateSE2:
        __slots__ = ("x", "y", "heading")

        def __init__(self, x: float, y: float, heading: float):
            self.x, self.y, self.heading = x, y, heading

    class StateVector2D:
        __slots__ = ("x", "y")

        def __init__(self, x: float, y: float):
            self.x, self.y = x, y

    class TimePoint:
        __slots__ = ("time_us",)

        def __init__(self, time_us: int):
            self.time_us = time_us

        @property
        def time_s(self) -> float:
            return self.time_us * 1e-6

    state_repr.StateSE2 = StateSE2
    state_repr.StateVector2D = StateVector2D
    state_repr.TimePoint = TimePoint

    ego_state = mod("nuplan.common.actor_state.ego_state")
    ego_state.EgoState = type("EgoState", (), {})

    vp = mod("nuplan.common.actor_state.vehicle_parameters")

    class VehicleParameters:
        """Public Chrysler Pacifica spec (same values as evaluate/vehicle.py)."""

        def __init__(self, width, front_length, rear_length, wheel_base,
                     cog_position_from_rear_axle, height, vehicle_name="pacifica"):
            self.width = width
            self.front_length = front_length
            self.rear_length = rear_length
            self.wheel_base = wheel_base
            self.cog_position_from_rear_axle = cog_position_from_rear_axle
            self.height = height
            self.vehicle_name = vehicle_name
            self.length = front_length + rear_length
            self.half_length = self.length / 2.0
            self.half_width = width / 2.0
            self.rear_axle_to_center = self.half_length - rear_length

    def get_pacifica_parameters() -> VehicleParameters:
        return VehicleParameters(
            width=2.297, front_length=4.049, rear_length=1.127,
            wheel_base=3.089, cog_position_from_rear_axle=1.67, height=1.777,
        )

    vp.VehicleParameters = VehicleParameters
    vp.get_pacifica_parameters = get_pacifica_parameters

    compute = mod("nuplan.common.geometry.compute")

    def principal_value(angle, min_=-np.pi):
        return (angle - min_) % (2.0 * np.pi) + min_

    compute.principal_value = principal_value

    sim_iter = mod("nuplan.planning.simulation.simulation_time_controller.simulation_iteration")

    class SimulationIteration:
        __slots__ = ("time_point", "index")

        def __init__(self, time_point, index: int):
            self.time_point, self.index = time_point, index

        @property
        def time_s(self) -> float:
            return self.time_point.time_s

    sim_iter.SimulationIteration = SimulationIteration

    nuplan.common = common
    common.actor_state = actor_state
    common.geometry = geometry
    nuplan.planning = planning
    planning.simulation = sim
    sim.simulation_time_controller = stc


def _import_reference(dotted: str):
    _install_nuplan_stub()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    return importlib.import_module(dotted)


_PDM = "navsim.planning.simulation.planner.pdm_planner"


# --------------------------------------------------------------------------- #
# Random state batches shaped like simulated rollouts
# --------------------------------------------------------------------------- #


def _random_states(rng: np.random.Generator, batch: int, time: int) -> np.ndarray:
    """(B, T, 11) StateIndex arrays with realistic driving magnitudes."""
    from diffusiondrive_tpu.common.enums import StateIndex as S

    states = np.zeros((batch, time, 11), dtype=np.float64)
    dt = 0.1
    v = np.clip(8.0 + np.cumsum(rng.normal(0, 0.3, (batch, time)), -1), 0.0, None)
    heading = rng.uniform(-np.pi, np.pi, (batch, 1)) + np.cumsum(
        rng.normal(0, 0.05, (batch, time)), -1
    )
    heading = np.arctan2(np.sin(heading), np.cos(heading))  # wrapped like real states
    states[..., S.X] = np.cumsum(v * np.cos(heading) * dt, -1)
    states[..., S.Y] = np.cumsum(v * np.sin(heading) * dt, -1)
    states[..., S.HEADING] = heading
    states[..., S.VELOCITY_X] = v
    states[..., S.VELOCITY_Y] = rng.normal(0, 0.1, (batch, time))
    states[..., S.ACCELERATION_X] = rng.normal(0, 1.5, (batch, time))
    states[..., S.ACCELERATION_Y] = rng.normal(0, 1.0, (batch, time))
    states[..., S.STEERING_ANGLE] = rng.uniform(-0.8, 0.8, (batch, time))
    states[..., S.STEERING_RATE] = rng.normal(0, 0.2, (batch, time))
    states[..., S.ANGULAR_VELOCITY] = rng.normal(0, 0.3, (batch, time))
    states[..., S.ANGULAR_ACCELERATION] = rng.normal(0, 0.5, (batch, time))
    return states


# --------------------------------------------------------------------------- #
# 0. Metric-index enum layout (pdm_enums)
# --------------------------------------------------------------------------- #


def test_metric_index_enums_match_reference():
    """Our MultiMetricIndex/WeightedMetricIndex match `pdm_enums.py:155-168`
    member-for-member: driving-direction is a WEIGHTED metric (weight 0), not
    a multiplicative one."""
    ref = _import_reference(f"{_PDM}.utils.pdm_enums")
    from diffusiondrive_tpu.common.enums import MultiMetricIndex, WeightedMetricIndex

    for ref_enum, ours in ((ref.MultiMetricIndex, MultiMetricIndex),
                           (ref.WeightedMetricIndex, WeightedMetricIndex)):
        members = {m.name: int(m.value) for m in ref_enum}
        assert ours.size() == len(members)
        for name, value in members.items():
            assert getattr(ours, name) == value, (ours.__name__, name)


# --------------------------------------------------------------------------- #
# 1. Comfort metrics (savgol suite)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("time", [41, 15, 6])
def test_comfort_differential(time):
    ref = _import_reference(f"{_PDM}.scoring.pdm_comfort_metrics")
    import jax

    from diffusiondrive_tpu.evaluate import comfort as ours

    rng = np.random.default_rng(2024)
    states = _random_states(rng, batch=128, time=time)
    time_point_s = np.arange(time, dtype=np.float64) * 0.1

    with jax.enable_x64(True):
        got = np.asarray(ours.ego_is_comfortable(states, time_point_s))

        # Intermediate raw metric values (catch window/polyorder misreads even
        # when the booleans happen to agree).
        dt = 0.1
        ref_lon_acc = ref._extract_ego_acceleration(states, "x", window_length=time)
        our_lon_acc = np.asarray(ours._extract_acceleration(states, "x", window_length=time))
        np.testing.assert_allclose(our_lon_acc, ref_lon_acc, atol=2e-5, rtol=1e-5)

        ref_jerk = ref._extract_ego_jerk(states, "magnitude", time_point_s, window_length=time)
        mag_acc = ours._extract_acceleration(states, "magnitude")
        our_jerk = np.asarray(ours._round8(ours._derivative(mag_acc, dt, time, 2, 1)))
        np.testing.assert_allclose(our_jerk, ref_jerk, atol=2e-5, rtol=1e-5)

        ref_yaw_rate = ref._extract_ego_yaw_rate(states, time_point_s, window_length=time)
        headings = ours._phase_unwrap(states[..., 2])
        our_yaw_rate = np.asarray(ours._round8(ours._derivative(headings, dt, 5, 2, 1)))
        np.testing.assert_allclose(our_yaw_rate, ref_yaw_rate, atol=2e-5, rtol=1e-5)

        ref_yaw_accel = ref._extract_ego_yaw_rate(
            states, time_point_s, deriv_order=2, poly_order=3, window_length=time
        )
        our_yaw_accel = np.asarray(ours._round8(ours._derivative(headings, dt, 5, 3, 2)))
        np.testing.assert_allclose(our_yaw_accel, ref_yaw_accel, atol=2e-5, rtol=1e-5)

    want = ref.ego_is_comfortable(states, time_point_s)
    np.testing.assert_array_equal(got, want)


# --------------------------------------------------------------------------- #
# 2. Velocity/curvature profile fits (batch_lqr_utils)
# --------------------------------------------------------------------------- #


def test_profile_fit_differential():
    ref = _import_reference(f"{_PDM}.simulation.batch_lqr_utils")
    import jax

    from diffusiondrive_tpu.evaluate.simulator import velocity_curvature_profiles_from_poses

    rng = np.random.default_rng(7)
    dt, jerk_penalty, curvature_rate_penalty = 0.1, 1e-4, 1e-2
    poses = _random_states(rng, batch=32, time=41)[..., :3]

    want_v, _, want_k, _ = ref.get_velocity_curvature_profiles_with_derivatives_from_poses(
        discretization_time=dt,
        poses=poses,
        jerk_penalty=jerk_penalty,
        curvature_rate_penalty=curvature_rate_penalty,
    )
    with jax.enable_x64(True):
        got_v, got_k = velocity_curvature_profiles_from_poses(
            poses, dt, jerk_penalty, curvature_rate_penalty
        )
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_k), want_k, atol=1e-6, rtol=1e-6)


# --------------------------------------------------------------------------- #
# 3. Kinematic bicycle propagate (batch_kinematic_bicycle)
# --------------------------------------------------------------------------- #


def test_bicycle_differential():
    ref = _import_reference(f"{_PDM}.simulation.batch_kinematic_bicycle")
    import jax

    from diffusiondrive_tpu.evaluate.simulator import BicycleParams, bicycle_propagate
    from diffusiondrive_tpu.evaluate.vehicle import get_pacifica_parameters

    state_repr = sys.modules["nuplan.common.actor_state.state_representation"]

    rng = np.random.default_rng(11)
    dt = 0.1
    states = _random_states(rng, batch=256, time=1)[:, 0, :]
    commands = np.stack(
        [rng.normal(0, 2.0, 256), rng.normal(0, 0.5, 256)], axis=-1
    )  # (B, 2): accel, steering rate (DynamicStateIndex order)

    model = ref.BatchKinematicBicycleModel()
    want = model.propagate_state(states.copy(), commands.copy(), state_repr.TimePoint(int(dt * 1e6)))

    with jax.enable_x64(True):
        got = np.asarray(
            bicycle_propagate(
                BicycleParams(), get_pacifica_parameters(), states, commands[:, 0], commands[:, 1], dt
            )
        )
    np.testing.assert_allclose(got, want, atol=1e-9, rtol=1e-9)


# --------------------------------------------------------------------------- #
# 3b. Full LQR tracker (batch_lqr.BatchLQRTracker)
# --------------------------------------------------------------------------- #
#
# Our closed-form LTV horizon composition (`evaluate/simulator.py:lqr_track_step`)
# replaces the reference's sequential 10-matrix einsum chain — self-derived math
# that these tests pin directly against the reference's own `batch_lqr.py:28-464`.


def _proposal_batch(rng: np.random.Generator, batch: int, time: int) -> np.ndarray:
    """(B, T, 11) proposal states: smooth driving + stationary ("stopping") mix.

    The last quarter of the batch is fully stationary (all poses identical),
    driving the profile fit to ~zero reference velocity so the tracker's
    stopping P-controller branch is exercised alongside the LQR branch.
    """
    states = _random_states(rng, batch, time)
    n_stop = batch // 4
    states[-n_stop:] = states[-n_stop:, :1]  # freeze every pose at t=0
    return states


def _reference_tracker(dt: float):
    ref = _import_reference(f"{_PDM}.simulation.batch_lqr")
    tracker = ref.BatchLQRTracker()
    tracker._discretization_time = dt
    return tracker


def _our_track_commands(proposals: np.ndarray, current: np.ndarray, t: int, dt: float):
    """Replicate PDMSimulator's per-step gathers, then run our tracker step."""
    from diffusiondrive_tpu.evaluate.simulator import (
        LQRParams,
        lqr_track_step,
        velocity_curvature_profiles_from_poses,
    )
    from diffusiondrive_tpu.evaluate.vehicle import get_pacifica_parameters

    lqr = LQRParams(discretization_time=dt)
    H = lqr.tracking_horizon
    velocity, curvature = velocity_curvature_profiles_from_poses(
        proposals[..., :3], dt, lqr.jerk_penalty, lqr.curvature_rate_penalty
    )
    n = velocity.shape[1]
    ref_vel = velocity[:, min(t + H, n - 1)]
    win = np.minimum(t + np.arange(H), n - 1)
    curv_win = curvature[:, win]
    return lqr_track_step(
        lqr, get_pacifica_parameters().wheel_base, current, proposals[:, t], ref_vel, curv_win
    )


@pytest.mark.parametrize("t", [0, 5, 20, 33, 39])
def test_lqr_tracker_step_differential(t):
    """Per-step accel/steering-rate commands vs the reference tracker,
    including lookahead clamping (t=33, 39) and the should_stop branch."""
    import jax

    state_repr = sys.modules.get("nuplan.common.actor_state.state_representation")

    dt, N = 0.1, 40
    rng = np.random.default_rng(100 + t)
    proposals = _proposal_batch(rng, batch=64, time=N + 1)
    # Perturbed "simulated" states at time t: real rollouts track imperfectly.
    current = proposals[:, t].copy()
    current[:, :3] += rng.normal(0, [0.5, 0.5, 0.05], (64, 3))
    current[:, 3] = np.clip(current[:, 3] + rng.normal(0, 0.5, 64), 0.0, None)
    current[:, 7] = rng.uniform(-0.3, 0.3, 64)
    current[-8:, 3] = rng.uniform(0.0, 0.19, 8)  # force both stop conditions

    tracker = _reference_tracker(dt)
    state_repr = sys.modules["nuplan.common.actor_state.state_representation"]
    sim_iter = sys.modules[
        "nuplan.planning.simulation.simulation_time_controller.simulation_iteration"
    ]
    tracker.update(proposals.copy())
    want = tracker.track_trajectory(
        sim_iter.SimulationIteration(state_repr.TimePoint(int(t * dt * 1e6)), t),
        sim_iter.SimulationIteration(state_repr.TimePoint(int((t + 1) * dt * 1e6)), t + 1),
        current.copy(),
    )  # (B, 2): [accel, steering_rate]

    with jax.enable_x64(True):
        accel, steer_rate = _our_track_commands(proposals, current, t, dt)
    np.testing.assert_allclose(np.asarray(accel), want[:, 0], atol=1e-9, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(steer_rate), want[:, 1], atol=1e-9, rtol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_simulate_proposals_rollout_differential(seed):
    """Full 41-step tracked rollout: our scan-based PDMSimulator vs the
    reference BatchLQRTracker + BatchKinematicBicycleModel stepped exactly as
    the reference `pdm_simulator.py:62-79` loop does (128 proposals x 3 seeds,
    driving + stationary mix)."""
    import jax

    ref_lqr = _import_reference(f"{_PDM}.simulation.batch_lqr")
    ref_bike = _import_reference(f"{_PDM}.simulation.batch_kinematic_bicycle")
    state_repr = sys.modules["nuplan.common.actor_state.state_representation"]
    sim_iter = sys.modules[
        "nuplan.planning.simulation.simulation_time_controller.simulation_iteration"
    ]

    from diffusiondrive_tpu.common.dataclasses import TrajectorySampling
    from diffusiondrive_tpu.evaluate.simulator import PDMSimulator

    dt, N, B = 0.1, 40, 128
    rng = np.random.default_rng(2000 + seed)
    proposals = _proposal_batch(rng, B, N + 1)
    init = proposals[0, 0].copy()
    init[3] = 0.15 if seed == 2 else init[3]  # seed 2: near-stopped initial ego

    # Reference rollout, hand-stepped like pdm_simulator.simulate_proposals
    tracker = ref_lqr.BatchLQRTracker()
    tracker._discretization_time = dt
    tracker.update(proposals[:, : N + 1].copy())
    model = ref_bike.BatchKinematicBicycleModel()
    want = np.zeros((B, N + 1, 11), dtype=np.float64)
    want[:, 0] = init
    for t in range(1, N + 1):
        cmd = tracker.track_trajectory(
            sim_iter.SimulationIteration(state_repr.TimePoint(int((t - 1) * dt * 1e6)), t - 1),
            sim_iter.SimulationIteration(state_repr.TimePoint(int(t * dt * 1e6)), t),
            want[:, t - 1].copy(),
        )
        want[:, t] = model.propagate_state(
            want[:, t - 1].copy(), cmd, state_repr.TimePoint(int(dt * 1e6))
        )

    sim = PDMSimulator(TrajectorySampling(num_poses=N, interval_length=dt))
    with jax.enable_x64(True):
        got = np.asarray(sim.simulate_proposals(proposals, init))

    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


# --------------------------------------------------------------------------- #
# 4. IDM policy propagate (batch_idm_policy)
# --------------------------------------------------------------------------- #


def test_idm_differential():
    ref = _import_reference(f"{_PDM}.proposal.batch_idm_policy")

    from diffusiondrive_tpu.planning.pdm_closed.idm import BatchIDMPolicy as OurIDM

    kwargs = dict(
        fallback_target_velocity=[15.0, 12.0, 10.0, 8.0, 5.0],
        speed_limit_fraction=[0.8, 0.9, 1.0, 1.1, 1.2],
        min_gap_to_lead_agent=[1.0, 1.0, 1.5, 2.0, 2.5],
        headway_time=[1.5, 1.5, 1.0, 1.0, 2.0],
        accel_max=[1.5, 1.5, 2.0, 2.0, 1.0],
        decel_max=[3.0, 3.0, 2.5, 2.0, 2.0],
    )
    theirs, mine = ref.BatchIDMPolicy(**kwargs), OurIDM(**kwargs)

    rng = np.random.default_rng(13)
    B = 64
    idcs = list(rng.integers(0, 5, B))
    prev = np.stack([rng.uniform(0, 50, B), rng.uniform(0, 15, B)], axis=-1)
    lead = np.stack(
        [rng.uniform(10, 120, B), rng.uniform(0, 15, B), rng.uniform(0.5, 3.0, B)], axis=-1
    )
    lead[:, 0] = np.maximum(lead[:, 0], prev[:, 0] + 0.5)  # lead ahead of ego

    for speed_limit in [None, 13.4]:
        theirs.update(speed_limit)
        mine.update(speed_limit)
        assert mine.max_target_velocity == theirs.max_target_velocity
        want = theirs.propagate(prev.copy(), lead.copy(), idcs, 0.1)
        got = mine.propagate(prev.copy(), lead.copy(), idcs, 0.1)
        np.testing.assert_allclose(got, want, atol=1e-12, rtol=1e-12)
