"""Savitzky-Golay filtering as a precomputed linear map.

The comfort metrics smooth/differentiate 41-sample signals with scipy's
`savgol_filter` (`pdm_comfort_metrics.py`). The filter (including its
`mode='interp'` edge handling) is linear in the input, so we build the exact
(T, T) matrix once on host by filtering the identity, and apply it on device
as a single matmul — bit-identical to scipy up to float precision, and it
rides the MXU instead of a host callback.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def savgol_matrix(
    num_samples: int, window_length: int, poly_order: int, deriv: int = 0, delta: float = 1.0
) -> np.ndarray:
    """Exact scipy-equivalent savgol operator: filtered = M @ y."""
    from scipy.signal import savgol_filter

    eye = np.eye(num_samples, dtype=np.float64)
    # filter each basis vector (columns) along axis 0
    M = savgol_filter(eye, window_length=window_length, polyorder=poly_order,
                      deriv=deriv, delta=delta, axis=0)
    return M  # float64; cast to the input dtype at the use site


def savgol_filter_jax(
    y: jnp.ndarray, window_length: int, poly_order: int, deriv: int = 0, delta: float = 1.0
) -> jnp.ndarray:
    """Apply savgol along the last axis of `y` (any leading batch dims)."""
    T = y.shape[-1]
    y = jnp.asarray(y)
    dtype = y.dtype if jnp.issubdtype(y.dtype, jnp.floating) else jnp.float32
    M = jnp.asarray(savgol_matrix(T, min(window_length, T), poly_order, deriv, delta), dtype=dtype)
    return jnp.einsum("...t,st->...s", y.astype(dtype), M)
