"""In-graph JV linear assignment vs scipy (the reference's solver).

The reference calls `scipy.optimize.linear_sum_assignment` on host once per
train step (`transfuser_loss.py:89-91`); ours runs inside the XLA program.
Optimal cost must match scipy exactly (assignments may differ on ties)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

from diffusiondrive_tpu.ops.hungarian import (
    batched_linear_sum_assignment,
    linear_sum_assignment,
)


def _opt_cost(c):
    ri, rc = scipy_lsa(c)
    return c[ri, rc].sum()


@pytest.mark.parametrize("n", [1, 2, 5, 30])
def test_matches_scipy_random(n):
    rng = np.random.default_rng(0)
    for trial in range(10):
        c = rng.uniform(size=(n, n)).astype(np.float32)
        col = np.asarray(linear_sum_assignment(jnp.asarray(c)))
        assert sorted(col.tolist()) == list(range(n)), col  # a permutation
        np.testing.assert_allclose(c[np.arange(n), col].sum(), _opt_cost(c), atol=1e-4)


def test_ties_and_structure():
    # all-equal costs: any permutation is optimal, must still be a permutation
    c = np.ones((6, 6), np.float32)
    col = np.asarray(linear_sum_assignment(jnp.asarray(c)))
    assert sorted(col.tolist()) == list(range(6))
    # diagonal-dominant: identity is uniquely optimal
    c = np.full((5, 5), 10.0, np.float32) - 9.0 * np.eye(5, dtype=np.float32)
    col = np.asarray(linear_sum_assignment(jnp.asarray(c)))
    np.testing.assert_array_equal(col, np.arange(5))
    # negative costs
    rng = np.random.default_rng(3)
    c = rng.normal(size=(12, 12)).astype(np.float32)
    col = np.asarray(linear_sum_assignment(jnp.asarray(c)))
    np.testing.assert_allclose(c[np.arange(12), col].sum(), _opt_cost(c), atol=1e-4)


def test_batched_under_jit():
    rng = np.random.default_rng(1)
    costs = rng.uniform(size=(4, 30, 30)).astype(np.float32)
    cols = np.asarray(jax.jit(batched_linear_sum_assignment)(jnp.asarray(costs)))
    for c, col in zip(costs, cols):
        np.testing.assert_allclose(c[np.arange(30), col].sum(), _opt_cost(c), atol=1e-4)


@pytest.mark.parametrize("B,n", [(8, 30), (3, 12), (16, 30), (1, 1)])
def test_pallas_kernel_matches_scipy(B, n):
    """The batch-in-sublanes Pallas kernel (interpret mode off-TPU)."""
    from diffusiondrive_tpu.ops.hungarian import _lsa_pallas

    rng = np.random.default_rng(42)
    costs = rng.normal(size=(B, n, n)).astype(np.float32)
    cols = np.asarray(_lsa_pallas(jnp.asarray(costs), interpret=True))
    for c, col in zip(costs, cols):
        assert sorted(col.tolist()) == list(range(n))
        np.testing.assert_allclose(c[np.arange(n), col].sum(), _opt_cost(c), atol=1e-4)


def test_pallas_kernel_ties_and_magnitudes():
    from diffusiondrive_tpu.ops.hungarian import _lsa_pallas

    c = np.ones((2, 6, 6), np.float32)  # ties: any permutation optimal
    cols = np.asarray(_lsa_pallas(jnp.asarray(c), interpret=True))
    for col in cols:
        assert sorted(col.tolist()) == list(range(6))
    c = (np.random.default_rng(7).uniform(size=(2, 10, 10)) * 1e9).astype(np.float32)
    cols = np.asarray(_lsa_pallas(jnp.asarray(c), interpret=True))
    for ci, col in zip(c, cols):
        np.testing.assert_allclose(ci[np.arange(10), col].sum(), _opt_cost(ci), rtol=1e-6)


def test_batched_sharded_over_mesh():
    """custom_partitioning: each shard solves only its rows; result equals the
    unsharded solve (conftest provides the 8-device CPU mesh)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devices), ("data",))
    rng = np.random.default_rng(5)
    B, n = 2 * len(devices), 30
    costs = rng.normal(size=(B, n, n)).astype(np.float32)
    sharded = jax.device_put(jnp.asarray(costs), NamedSharding(mesh, P("data", None, None)))
    f = jax.jit(
        batched_linear_sum_assignment,
        in_shardings=NamedSharding(mesh, P("data", None, None)),
        out_shardings=NamedSharding(mesh, P("data", None)),
    )
    cols = np.asarray(f(sharded))
    plain = np.asarray(jax.jit(batched_linear_sum_assignment)(jnp.asarray(costs)))
    np.testing.assert_array_equal(cols, plain)
    for c, col in zip(costs, cols):
        np.testing.assert_allclose(c[np.arange(n), col].sum(), _opt_cost(c), atol=1e-4)


def test_extreme_magnitudes():
    # large finite costs must not collide with the internal INF sentinel
    rng = np.random.default_rng(7)
    c = (rng.uniform(size=(10, 10)) * 1e9).astype(np.float32)
    col = np.asarray(linear_sum_assignment(jnp.asarray(c)))
    assert sorted(col.tolist()) == list(range(10))
    np.testing.assert_allclose(c[np.arange(10), col].sum(), _opt_cost(c), rtol=1e-6)
    # mixed tiny/huge
    c = np.where(np.eye(8, dtype=bool), 1e-6, 1e8).astype(np.float32)
    col = np.asarray(linear_sum_assignment(jnp.asarray(c)))
    np.testing.assert_array_equal(col, np.arange(8))
