"""Closed-form oracle tests for the kinematic bicycle model.

The Euler + first-order-lag dynamics (`batch_kinematic_bicycle.py:29-185`
parity) are linear for constant commands, so velocity/position/heading have
exact closed forms (geometric sums / Dirichlet kernels) derived here
independently of the implementation's recursion.
"""

import numpy as np
import jax.numpy as jnp

from diffusiondrive_tpu.common.enums import StateIndex
from diffusiondrive_tpu.evaluate.simulator import BicycleParams, bicycle_propagate
from diffusiondrive_tpu.evaluate.vehicle import get_pacifica_parameters

S = StateIndex
DT = 0.1


def rollout(init, accel_cmd, steer_rate_cmd, n):
    params, vehicle = BicycleParams(), get_pacifica_parameters()
    states = [np.asarray(init, np.float64).reshape(1, -1)]
    cur = jnp.asarray(states[0])
    for _ in range(n):
        cur = bicycle_propagate(params, vehicle, cur,
                                jnp.full((1,), accel_cmd), jnp.full((1,), steer_rate_cmd), DT)
        states.append(np.asarray(cur, np.float64))
    return np.concatenate(states, axis=0)  # (n+1, 11)


def test_constant_accel_command_closed_form():
    """Constant accel command a with tau=0.2 lag:

    rho = tau / (dt + tau); accel_k = a (1 - rho^k)
    v_k  = v0 + a dt (k - rho (1 - rho^k) / (1 - rho))
    x_k  = dt sum_{j<k} v_j  (position integrates the *old* velocity)
    """
    a, v0, n = 1.5, 3.0, 40
    tau = BicycleParams().accel_time_constant
    rho = tau / (DT + tau)
    k = np.arange(n + 1)

    accel_k = a * (1.0 - rho ** k)
    v_k = v0 + a * DT * (k - rho * (1.0 - rho ** k) / (1.0 - rho))
    x_k = np.concatenate([[0.0], np.cumsum(v_k[:-1]) * DT])

    out = rollout(np.zeros(S.size()) + np.eye(S.size())[S.VELOCITY_X] * v0, a, 0.0, n)
    np.testing.assert_allclose(out[:, S.ACCELERATION_X], accel_k, atol=1e-5)
    np.testing.assert_allclose(out[:, S.VELOCITY_X], v_k, atol=1e-4)
    np.testing.assert_allclose(out[:, S.X], x_k, atol=1e-4)
    np.testing.assert_allclose(out[:, S.Y], 0.0, atol=1e-9)


def test_constant_steering_discrete_circle_closed_form():
    """Constant steering angle delta at constant speed v:

    heading_k = k v tan(delta)/L dt  (exact: heading integrates old vx)
    position_k = v dt sum_{j<k} e^{i heading_j}
               = v dt e^{i 0} (e^{i k phi} - 1)/(e^{i phi} - 1)   (phi = step)
    """
    v, delta, n = 5.0, 0.12, 40
    L = get_pacifica_parameters().wheel_base
    phi = v * np.tan(delta) / L * DT

    init = np.zeros(S.size())
    init[S.VELOCITY_X] = v
    init[S.STEERING_ANGLE] = delta
    out = rollout(init, 0.0, 0.0, n)

    k = np.arange(n + 1)
    np.testing.assert_allclose(out[:, S.HEADING], ((k * phi + np.pi) % (2 * np.pi)) - np.pi,
                               atol=1e-5)

    z = np.exp(1j * phi)
    pos = v * DT * (z ** k - 1.0) / (z - 1.0)   # sum_{j<k} z^j
    np.testing.assert_allclose(out[:, S.X], pos.real, atol=1e-4)
    np.testing.assert_allclose(out[:, S.Y], pos.imag, atol=1e-4)

    # steering stays exactly at delta (zero rate command, lag is a no-op)
    np.testing.assert_allclose(out[:, S.STEERING_ANGLE], delta, atol=1e-7)


def test_steering_rate_lag_closed_form():
    """Constant steering-rate command r with tau=0.05:

    ideal_k+1 = delta_k + r dt; the lag update gives
    delta_{k+1} = delta_k + (dt/(dt+tau)) r dt  -> exactly linear growth.
    """
    r, n = 0.2, 20
    tau = BicycleParams().steering_angle_time_constant
    gain = DT / (DT + tau)

    init = np.zeros(S.size())
    out = rollout(init, 0.0, r, n)
    k = np.arange(n + 1)
    np.testing.assert_allclose(out[:, S.STEERING_ANGLE], gain * r * DT * k, atol=1e-6)
    np.testing.assert_allclose(out[:, S.STEERING_RATE][1:], gain * r, atol=1e-6)
