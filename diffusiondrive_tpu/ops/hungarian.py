"""Exact linear assignment (Hungarian / Jonker-Volgenant) in pure JAX.

Replaces the host-side `scipy.optimize.linear_sum_assignment` the reference
calls once per training step (`transfuser_loss.py:89-91` — a GPU->CPU sync
every step). Here the shortest-augmenting-path algorithm runs inside the XLA
program (O(n^3), n = 30 boxes), is vmappable over the batch, and keeps the
whole train step device-resident.

The per-step column relaxation is vectorized (VPU-friendly); only the
augmenting-path search/walk are `lax.while_loop`s, each bounded by n+1
iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e18)


def linear_sum_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve the square LAP, minimizing ``sum(cost[i, col[i]])``.

    :param cost: (n, n) cost matrix
    :return: (n,) int32 `col`, with col[i] the column assigned to row i.
    """
    n = cost.shape[0]
    assert cost.shape == (n, n), "linear_sum_assignment expects a square matrix"
    cost = cost.astype(jnp.float32)

    # 1-indexed columns; index 0 is the virtual start column.
    # p[j]: row (1..n) matched to column j (0 = free). u/v: dual potentials.
    u0 = jnp.zeros(n + 1, jnp.float32)
    v0 = jnp.zeros(n + 1, jnp.float32)
    p0 = jnp.zeros(n + 1, jnp.int32)

    cpad = jnp.zeros((n + 1, n + 1), jnp.float32).at[1:, 1:].set(cost)

    def assign_row(carry, i):
        u, v, p = carry
        p = p.at[0].set(i)

        def search_body(state):
            u, v, p, minv, used, way, j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]

            cur = cpad[i0] - u[i0] - v
            better = (cur < minv) & ~used
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)

            masked = jnp.where(used, _INF, minv).at[0].set(_INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]

            u = u + jnp.zeros(n + 1, jnp.float32).at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, used, way, j1

        def search_cond(state):
            _, _, p, _, _, _, j0 = state
            return p[j0] != 0

        state = (
            u, v, p,
            jnp.full(n + 1, _INF),          # minv
            jnp.zeros(n + 1, bool),          # used
            jnp.zeros(n + 1, jnp.int32),     # way
            jnp.int32(0),                    # j0 (virtual column holding row i)
        )
        state = search_body(state)  # first step always runs
        u, v, p, _, _, way, j0 = jax.lax.while_loop(search_cond, search_body, state)

        def aug_body(state):
            p, j0 = state
            j1 = way[j0]
            return p.at[j0].set(p[j1]), j1

        p, _ = jax.lax.while_loop(lambda s: s[1] != 0, aug_body, (p, j0))
        return (u, v, p), None

    (_, _, p), _ = jax.lax.scan(assign_row, (u0, v0, p0), jnp.arange(1, n + 1, dtype=jnp.int32))

    # p[j] = row matched to col j (1-indexed)  ->  col[i] (0-indexed)
    return jnp.zeros(n, jnp.int32).at[p[1:] - 1].set(jnp.arange(n, dtype=jnp.int32))


batched_linear_sum_assignment = jax.vmap(linear_sum_assignment)
