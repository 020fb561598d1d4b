"""Comfort metrics: six savgol-filtered kinematic bounds.

Parity: `pdm_planner/scoring/pdm_comfort_metrics.py` — lon/lat acceleration,
magnitude jerk, lon jerk, yaw acceleration, yaw rate, each bounded after
Savitzky-Golay smoothing/differentiation. All device-side (filters are
precomputed matrices, see `ops/savgol.py`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from diffusiondrive_tpu.common.enums import StateIndex
from diffusiondrive_tpu.ops.savgol import savgol_filter_jax

# nuplan comfort bounds
MAX_ABS_MAG_JERK = 8.37      # [m/s^3]
MAX_ABS_LAT_ACCEL = 4.89     # [m/s^2]
MAX_LON_ACCEL = 2.40         # [m/s^2]
MIN_LON_ACCEL = -4.05
MAX_ABS_YAW_ACCEL = 1.93     # [rad/s^2]
MAX_ABS_LON_JERK = 4.13      # [m/s^3]
MAX_ABS_YAW_RATE = 0.95      # [rad/s]


def _round8(x: jnp.ndarray) -> jnp.ndarray:
    """Reference rounds to 8 decimals before thresholding."""
    return jnp.round(x * 1e8) / 1e8


def _extract_acceleration(states: jnp.ndarray, coord: str, window_length: int = 8) -> jnp.ndarray:
    T = states.shape[-2]
    if coord == "x":
        acc = states[..., StateIndex.ACCELERATION_X]
    elif coord == "y":
        acc = states[..., StateIndex.ACCELERATION_Y]
    else:  # magnitude
        acc = jnp.hypot(states[..., StateIndex.ACCELERATION_X], states[..., StateIndex.ACCELERATION_Y])
    return _round8(savgol_filter_jax(acc, min(window_length, T), 2))


def _phase_unwrap(headings: jnp.ndarray) -> jnp.ndarray:
    two_pi = 2.0 * np.pi
    diffs = jnp.diff(headings, axis=-1)
    adjustments = jnp.cumsum(jnp.round(diffs / two_pi), axis=-1)
    adjustments = jnp.concatenate([jnp.zeros_like(headings[..., :1]), adjustments], axis=-1)
    return headings - two_pi * adjustments


def _derivative(y: jnp.ndarray, dt: float, window_length: int, poly_order: int, deriv: int) -> jnp.ndarray:
    T = y.shape[-1]
    return savgol_filter_jax(y, min(window_length, T), poly_order, deriv=deriv, delta=dt)


def _within(x: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    return jnp.all((x > lo) & (x < hi), axis=-1)


def ego_is_comfortable(states: jnp.ndarray, time_point_s: np.ndarray) -> jnp.ndarray:
    """(..., T, 11) states -> (..., 6) per-metric within-bound booleans."""
    T = states.shape[-2]
    dt = float(time_point_s[1] - time_point_s[0])

    lon_acc = _extract_acceleration(states, "x", window_length=T)
    lat_acc = _extract_acceleration(states, "y", window_length=T)

    mag_acc = _extract_acceleration(states, "magnitude")  # default window 8
    jerk = _round8(_derivative(mag_acc, dt, window_length=T, poly_order=2, deriv=1))

    x_acc = _extract_acceleration(states, "x")  # default window 8
    lon_jerk = _round8(_derivative(x_acc, dt, window_length=T, poly_order=2, deriv=1))

    # NOTE: `_extract_ego_yaw_rate` never forwards its window_length to
    # `_approximate_derivatives`, so both yaw metrics use the latter's
    # default window of 5 (`pdm_comfort_metrics.py:135-141,180`).
    headings = _phase_unwrap(states[..., StateIndex.HEADING])
    yaw_rate = _round8(_derivative(headings, dt, window_length=5, poly_order=2, deriv=1))
    yaw_accel = _round8(_derivative(headings, dt, window_length=5, poly_order=3, deriv=2))

    return jnp.stack(
        [
            _within(lon_acc, MIN_LON_ACCEL, MAX_LON_ACCEL),
            _within(lat_acc, -MAX_ABS_LAT_ACCEL, MAX_ABS_LAT_ACCEL),
            _within(jerk, -MAX_ABS_MAG_JERK, MAX_ABS_MAG_JERK),
            _within(lon_jerk, -MAX_ABS_LON_JERK, MAX_ABS_LON_JERK),
            _within(yaw_accel, -MAX_ABS_YAW_ACCEL, MAX_ABS_YAW_ACCEL),
            _within(yaw_rate, -MAX_ABS_YAW_RATE, MAX_ABS_YAW_RATE),
        ],
        axis=-1,
    )
