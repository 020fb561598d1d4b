"""Batched LQR-tracked kinematic-bicycle re-simulation (pure JAX).

Parity targets:
- `pdm_planner/simulation/batch_kinematic_bicycle.py` (rear-axle bicycle,
  1st-order lag on accel tau=0.2 / steering tau=0.05, Euler integration,
  steering clip +-pi/3),
- `pdm_planner/simulation/batch_lqr.py` (decoupled longitudinal 1-state LQR +
  lateral 3-state LTV LQR over a 10-step horizon, stopping P-controller below
  0.2 m/s),
- `pdm_planner/simulation/batch_lqr_utils.py` (velocity/curvature profile
  estimation from poses via jerk/curvature-rate-regularized least squares),
- `pdm_planner/simulation/pdm_simulator.py` (the 40-step rollout).

TPU design: the whole rollout is one `lax.scan` over time with a batched
proposal dim; the profile fits are batched 40x40 linear solves. The reference
re-simulates ONE scene's proposals per Ray task — here the proposal dim can be
(scenes x proposals), so thousands of scenes simulate in a single XLA launch
sharded over the mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusiondrive_tpu.common.dataclasses import TrajectorySampling
from diffusiondrive_tpu.common.enums import StateIndex
from diffusiondrive_tpu.common.geometry import normalize_angle
from diffusiondrive_tpu.evaluate.vehicle import VehicleParameters, get_pacifica_parameters

INITIAL_CURVATURE_PENALTY = 1e-10


def _solve_spd(AtA: jnp.ndarray, Aty: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD solve via Cholesky: (B, M, M), (B, M) -> (B, M).

    The normal-equation matrices here are PD by construction (A^T A plus a
    positive-diagonal regularizer), and on TPU the pivoting LU behind
    `jnp.linalg.solve` is ~1.5x slower than Cholesky + two triangular solves
    at this (2048, 40, 40) batch shape (measured)."""
    L = jnp.linalg.cholesky(AtA)
    z = jax.scipy.linalg.solve_triangular(L, Aty[..., None], lower=True)
    return jax.scipy.linalg.solve_triangular(jnp.swapaxes(L, -1, -2), z, lower=False)[..., 0]


# --------------------------------------------------------------------------- #
# Velocity / curvature profile estimation (batch_lqr_utils.py)
# --------------------------------------------------------------------------- #


def _generate_profile(initial: jnp.ndarray, derivatives: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Euler-integrate derivatives: (B,), (B, M-1) -> (B, M)."""
    cumsum = jnp.cumsum(derivatives * dt, axis=-1)
    return jnp.concatenate([initial[:, None], initial[:, None] + cumsum], axis=-1)


def fit_velocity_and_acceleration(
    xy_displacements: jnp.ndarray,  # (B, M, 2)
    heading_profile: jnp.ndarray,   # (B, M) headings at the starting pose of each displacement
    dt: float,
    jerk_penalty: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Least squares [v_0, a_0..a_{M-2}] with jerk regularization
    (`_fit_initial_velocity_and_acceleration_profile`)."""
    B, M, _ = xy_displacements.shape
    y = xy_displacements.reshape(B, 2 * M)

    a_col = jnp.zeros((B, 2 * M))
    a_col = a_col.at[:, 0::2].set(jnp.cos(heading_profile))
    a_col = a_col.at[:, 1::2].set(jnp.sin(heading_profile))

    # A[b, 2i+c, 0] = u_i * dt ; A[b, 2i+c, j>=1] = u_i * dt^2 for j <= i else 0
    A = jnp.repeat(a_col[..., None] * dt**2, M, axis=2)
    A = A.at[..., 0].set(a_col * dt)
    row_i = np.repeat(np.arange(M), 2)                     # displacement index per row
    col_j = np.arange(M)
    keep = ~(col_j[None, :] > row_i[:, None])              # zero where j > i (cols >= 1)
    keep[:, 0] = True
    A = A * jnp.asarray(keep, dtype=A.dtype)[None]

    # Jerk regularizer R = [0 | banded] of shape (M-2, M), replicated EXACTLY
    # from the reference (`batch_lqr_utils.py:_make_banded_difference_matrix`):
    # the second assignment there OVERWRITES the +1 band it just set, so every
    # row but the last penalizes -a_i directly and only the last row is a true
    # difference a_{M-2} - a_{M-3}. A textbook difference matrix here shifts
    # fitted velocities by ~4% (tests/test_reference_differential.py caught
    # it); PDMS parity requires the shipped numerics, not the docstring's.
    banded = np.zeros((M - 2, M - 1))
    banded[:, 1:] = np.eye(M - 2)
    banded[:, :-1] = -np.eye(M - 2)
    R = jnp.asarray(np.concatenate([np.zeros((M - 2, 1)), banded], axis=1), dtype=A.dtype)

    AtA = jnp.einsum("bij,bik->bjk", A, A) + jerk_penalty * (R.T @ R)[None]
    Aty = jnp.einsum("bij,bi->bj", A, y)
    x = _solve_spd(AtA, Aty)
    return x[:, 0], x[:, 1:]


def fit_curvature_and_curvature_rate(
    heading_displacements: jnp.ndarray,  # (B, M)
    velocity_profile: jnp.ndarray,       # (B, M)
    dt: float,
    curvature_rate_penalty: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Least squares [k_0, kdot_0..kdot_{M-2}] with curvature-rate
    regularization (`_fit_initial_curvature_and_curvature_rate_profile`)."""
    B, M = heading_displacements.shape
    y = heading_displacements

    A = jnp.asarray(np.tril(np.ones((M, M))), dtype=y.dtype)[None].repeat(B, axis=0)
    A = A.at[:, :, 0].set(velocity_profile * dt)
    scale = velocity_profile * dt**2  # (B, M)
    A = A.at[:, 1:, 1:].multiply(scale[:, 1:, None])

    Q = curvature_rate_penalty * np.eye(M)
    Q[0, 0] = INITIAL_CURVATURE_PENALTY

    AtA = jnp.einsum("bij,bik->bjk", A, A) + jnp.asarray(Q, dtype=y.dtype)[None]
    Aty = jnp.einsum("bij,bi->bj", A, y)
    x = _solve_spd(AtA, Aty)
    return x[:, 0], x[:, 1:]


def velocity_curvature_profiles_from_poses(
    poses: jnp.ndarray, dt: float, jerk_penalty: float, curvature_rate_penalty: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N+1, 3) poses -> velocity (B, N) and curvature (B, N) profiles."""
    diffs = jnp.diff(poses, axis=1)
    xy_displacements = diffs[..., :2]
    heading_displacements = normalize_angle(diffs[..., 2], xp=jnp)

    v0, accel = fit_velocity_and_acceleration(xy_displacements, poses[:, :-1, 2], dt, jerk_penalty)
    velocity = _generate_profile(v0, accel, dt)
    k0, k_rate = fit_curvature_and_curvature_rate(heading_displacements, velocity, dt, curvature_rate_penalty)
    curvature = _generate_profile(k0, k_rate, dt)
    return velocity, curvature


# --------------------------------------------------------------------------- #
# LQR tracker (batch_lqr.py)
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class LQRParams:
    q_longitudinal: float = 10.0
    r_longitudinal: float = 1.0
    q_lateral: Tuple[float, float, float] = (1.0, 10.0, 0.0)
    r_lateral: float = 1.0
    discretization_time: float = 0.1
    tracking_horizon: int = 10
    jerk_penalty: float = 1e-4
    curvature_rate_penalty: float = 1e-2
    stopping_proportional_gain: float = 0.5
    stopping_velocity: float = 0.2


def lqr_track_step(
    params: LQRParams,
    wheel_base: float,
    current_states: jnp.ndarray,        # (B, 11) simulated states at time t
    reference_states: jnp.ndarray,      # (B, 11) proposal states at time t
    reference_velocities: jnp.ndarray,  # (B,) velocity at the lookahead index
    curvature_profiles: jnp.ndarray,    # (B, H) curvature window starting at t
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One tracking step -> (accel_cmd, steering_rate_cmd), each (B,)."""
    dt, H = params.discretization_time, params.tracking_horizon

    # Initial velocity + Frenet lateral state
    x_err = current_states[:, StateIndex.X] - reference_states[:, StateIndex.X]
    y_err = current_states[:, StateIndex.Y] - reference_states[:, StateIndex.Y]
    head_ref = reference_states[:, StateIndex.HEADING]
    lateral_err = -x_err * jnp.sin(head_ref) + y_err * jnp.cos(head_ref)
    heading_err = normalize_angle(current_states[:, StateIndex.HEADING] - head_ref, xp=jnp)
    v0 = current_states[:, StateIndex.VELOCITY_X]
    lat_state = jnp.stack([lateral_err, heading_err, current_states[:, StateIndex.STEERING_ANGLE]], axis=-1)

    # Stopping P-controller
    should_stop = (reference_velocities <= params.stopping_velocity) & (v0 <= params.stopping_velocity)
    stop_accel = -params.stopping_proportional_gain * (v0 - reference_velocities)

    # Longitudinal 1-step LQR: v_N = v_0 + (H*dt) a
    Blon = H * dt
    err0 = v0 - reference_velocities
    lqr_accel = (-1.0 / (Blon * params.q_longitudinal * Blon + params.r_longitudinal)) * (
        Blon * params.q_longitudinal * err0
    )

    accel_cmd = jnp.where(should_stop, stop_accel, lqr_accel)

    # Velocity profile under constant accel over the horizon (length H)
    steps = jnp.arange(H, dtype=v0.dtype)
    velocity_profile = v0[:, None] + accel_cmd[:, None] * steps[None, :] * dt  # (B, H)

    # Lateral LTV composition over the H-step horizon, in CLOSED FORM.
    #
    # Each per-step matrix is unit upper-triangular with two entries,
    #   M_k = I + a_k E01 + b_k E12,   a_k = v_k dt,  b_k = v_k dt / L,
    # so the ordered product P = M_{H-1} ... M_0 collapses to
    #   P = I + (sum a) E01 + (sum b) E12 + (sum_{i>j} a_i b_j) E02,
    # and the accumulated input/affine terms reduce to weighted sums:
    #   B_total = dt * [sum_j j b_j sufa_j, sum_j j b_j, H],
    #   g_total = [sum_k gamma_k sufa_k, sum_k gamma_k, 0],
    # with sufa_j = sum_{i>j} a_i and gamma_k = -v_k c_k dt. This replaces the
    # reference's sequential 10-matrix einsum chain (`batch_lqr.py`, mirrored
    # here as a fori_loop until round 2) with a handful of (B, H) reductions —
    # no loop, no (B, 3, 3) matmul chain, same math to fp reordering.
    B_ = v0.shape[0]
    a = velocity_profile * dt                               # (B, H)
    b = velocity_profile * (dt / wheel_base)                # (B, H)
    gamma = -velocity_profile * curvature_profiles * dt     # (B, H)
    sum_a = a.sum(-1)
    sum_b = b.sum(-1)
    sufa = sum_a[:, None] - jnp.cumsum(a, axis=-1)          # (B, H): sum_{i>j} a_i
    cross = (sufa * b).sum(-1)                              # sum_{i>j} a_i b_j
    ks = jnp.arange(H, dtype=v0.dtype)

    A = jnp.zeros((B_, 3, 3), v0.dtype)
    A = A.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0).at[:, 2, 2].set(1.0)
    A = A.at[:, 0, 1].set(sum_a).at[:, 1, 2].set(sum_b).at[:, 0, 2].set(cross)

    Bm = jnp.stack(
        [dt * (ks * b * sufa).sum(-1), dt * (ks * b).sum(-1), jnp.full((B_,), H * dt, v0.dtype)],
        axis=-1,
    )[..., None]                                            # (B, 3, 1)
    g = jnp.stack(
        [(gamma * sufa).sum(-1), gamma.sum(-1), jnp.zeros((B_,), v0.dtype)], axis=-1
    )                                                       # (B, 3)

    Q = jnp.diag(jnp.asarray(params.q_lateral, dtype=v0.dtype))
    err = jnp.einsum("bij,bj->bi", A, lat_state) + g
    err = err.at[:, 1:].set(normalize_angle(err[:, 1:], xp=jnp))  # wrap heading/steering terms

    BT_Q = jnp.einsum("bji,jk->bik", Bm, Q)      # (B, 1, 3)
    inv = -1.0 / (jnp.einsum("bij,bji->bi", BT_Q, Bm) + params.r_lateral)  # (B, 1)
    tail = jnp.einsum("bij,bj->bi", BT_Q, err)   # (B, 1)
    steering_rate_cmd = (inv * tail)[:, 0]

    steering_rate_cmd = jnp.where(should_stop, 0.0, steering_rate_cmd)
    return accel_cmd, steering_rate_cmd


# --------------------------------------------------------------------------- #
# Kinematic bicycle model (batch_kinematic_bicycle.py)
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class BicycleParams:
    max_steering_angle: float = float(np.pi / 3)
    accel_time_constant: float = 0.2
    steering_angle_time_constant: float = 0.05


def bicycle_propagate(
    params: BicycleParams,
    vehicle: VehicleParameters,
    states: jnp.ndarray,          # (B, 11)
    accel_cmds: jnp.ndarray,      # (B,)
    steering_rate_cmds: jnp.ndarray,  # (B,)
    dt: float,
) -> jnp.ndarray:
    """One Euler step of the rear-axle bicycle with 1st-order command lag."""
    S = StateIndex
    accel = states[:, S.ACCELERATION_X]
    steering_angle = states[:, S.STEERING_ANGLE]

    ideal_steering = dt * steering_rate_cmds + steering_angle
    updated_accel = dt / (dt + params.accel_time_constant) * (accel_cmds - accel) + accel
    updated_steering = (
        dt / (dt + params.steering_angle_time_constant) * (ideal_steering - steering_angle) + steering_angle
    )
    updated_steering_rate = (updated_steering - steering_angle) / dt

    vx = states[:, S.VELOCITY_X]
    heading = states[:, S.HEADING]

    new_vx = vx + updated_accel * dt
    # lateral velocity is zero in the bicycle model
    new_steering = jnp.clip(
        steering_angle + updated_steering_rate * dt, -params.max_steering_angle, params.max_steering_angle
    )
    new_angular_velocity = new_vx * jnp.tan(new_steering) / vehicle.wheel_base
    zeros = jnp.zeros_like(vx)
    # one stacked write in StateIndex order (X..ANGULAR_ACCELERATION) instead
    # of a chain of scatter updates — this runs inside the 40-step scan
    return jnp.stack(
        [
            states[:, S.X] + vx * jnp.cos(heading) * dt,
            states[:, S.Y] + vx * jnp.sin(heading) * dt,
            normalize_angle(heading + vx * jnp.tan(steering_angle) / vehicle.wheel_base * dt, xp=jnp),
            new_vx,
            zeros,                                   # VELOCITY_Y
            updated_accel,                           # ACCELERATION_X
            zeros,                                   # ACCELERATION_Y
            new_steering,
            updated_steering_rate,
            new_angular_velocity,
            (new_angular_velocity - states[:, S.ANGULAR_VELOCITY]) / dt,
        ],
        axis=-1,
    )


# --------------------------------------------------------------------------- #
# PDM simulator (pdm_simulator.py)
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class PDMSimulator:
    """Batch re-simulation of proposals; jit/vmap-able end to end."""

    proposal_sampling: TrajectorySampling
    lqr: LQRParams = LQRParams()
    bicycle: BicycleParams = BicycleParams()
    vehicle: VehicleParameters = dataclasses.field(default_factory=get_pacifica_parameters)

    def simulate_proposals(self, states: jnp.ndarray, initial_state: jnp.ndarray) -> jnp.ndarray:
        """
        :param states: (B, >=N+1, 11) proposal state arrays (absolute frame)
        :param initial_state: (11,) current ego state array
        :return: (B, N+1, 11) simulated states
        """
        num_poses = self.proposal_sampling.num_poses
        dt = self.proposal_sampling.interval_length
        lqr = dataclasses.replace(self.lqr, discretization_time=dt)
        H = lqr.tracking_horizon

        proposal_states = states[:, : num_poses + 1]
        B = proposal_states.shape[0]

        velocity, curvature = velocity_curvature_profiles_from_poses(
            proposal_states[..., StateIndex.STATE_SE2], dt, lqr.jerk_penalty, lqr.curvature_rate_penalty
        )  # (B, N), (B, N)

        # Per-step lookahead gathers, computed up-front with static indexing:
        # ref_velocity[t] = velocity[min(t+H, N-1)], curv window[t, k] = curvature[min(t+k, N-1)]
        t_idx = np.arange(num_poses)  # current_iteration.index = 0..N-1
        ref_v_idx = np.minimum(t_idx + H, num_poses - 1)
        ref_velocities = velocity[:, ref_v_idx]                       # (B, N)
        win_idx = np.minimum(t_idx[:, None] + np.arange(H)[None, :], num_poses - 1)  # (N, H)
        curv_windows = curvature[:, win_idx]                          # (B, N, H)

        init = jnp.broadcast_to(initial_state[None], (B, initial_state.shape[0])).astype(proposal_states.dtype)

        def step(carry, xs):
            current = carry
            ref_state, ref_vel, curv_win = xs
            accel, steer_rate = lqr_track_step(
                lqr, self.vehicle.wheel_base, current, ref_state, ref_vel, curv_win
            )
            nxt = bicycle_propagate(self.bicycle, self.vehicle, current, accel, steer_rate, dt)
            return nxt, nxt

        xs = (
            proposal_states[:, :-1].swapaxes(0, 1),   # reference at t = 0..N-1
            ref_velocities.swapaxes(0, 1),
            curv_windows.swapaxes(0, 1),
        )
        _, rollout = jax.lax.scan(step, init, xs)
        return jnp.concatenate([init[None], rollout], axis=0).swapaxes(0, 1)
