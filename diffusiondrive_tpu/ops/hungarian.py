"""Exact linear assignment (Hungarian / Jonker-Volgenant) in pure JAX.

Replaces the host-side `scipy.optimize.linear_sum_assignment` the reference
calls once per training step (`transfuser_loss.py:89-91` — a GPU->CPU sync
every step). Here the shortest-augmenting-path algorithm runs inside the XLA
program (O(n^3), n = 30 boxes), is vmappable over the batch, and keeps the
whole train step device-resident.

TPU shape (round-3 rework, profiled on v5e): the textbook data-dependent
`lax.while_loop` costs ~20 µs/iteration of loop/cond overhead — ~21 ms per
train step for batch 8, a quarter of the whole step. Rewritten as
fixed-trip `fori_loop`s (n+1 iterations, `done`-masked no-ops after the
augmenting column is found, moderate unroll) it runs the same algorithm in
~6.6 ms: no early exit, but on TPU a predictable loop the compiler can
pipeline beats a shorter dynamic one. The dual-potential update uses an
incrementally maintained used-row mask instead of a scatter over the match
vector (one new row becomes "used" per iteration).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e18)

# inner-loop unroll: 8 measured fastest of {1, 8, 31} on v5e (6.6/7.1/7.7 ms)
_UNROLL = 8


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

        def search_body(_, state):
            u, v, minv, used, urow, way, j0, done = state
            used2 = used.at[j0].set(True)
            i0 = p[j0]
            urow2 = urow.at[i0].set(True)  # the one row that joins the tree

            cur = cpad[i0] - u[i0] - v
            better = (cur < minv) & ~used2
            minv2 = jnp.where(better, cur, minv)
            way2 = jnp.where(better, j0, way)

            masked = jnp.where(used2, _INF, minv2).at[0].set(_INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]

            u2 = jnp.where(urow2, u + delta, u)
            v2 = jnp.where(used2, v - delta, v)
            minv2 = jnp.where(used2, minv2, minv2 - delta)
            new_done = done | (p[j1] == 0)  # j1 free -> this body ran last

            sel = lambda frozen, live: jnp.where(done, frozen, live)
            return (sel(u, u2), sel(v, v2), sel(minv, minv2), sel(used, used2),
                    sel(urow, urow2), sel(way, way2), jnp.where(done, j0, j1),
                    new_done)

        state = (
            u, v,
            jnp.full(n + 1, _INF),          # minv
            jnp.zeros(n + 1, bool),          # used columns
            jnp.zeros(n + 1, bool),          # used rows (incremental, no scatter)
            jnp.zeros(n + 1, jnp.int32),     # way
            jnp.int32(0),                    # j0 (virtual column holding row i)
            jnp.bool_(False),                # done
        )
        # at most n+1 columns join the alternating tree
        u, v, _, _, _, way, j0, _ = jax.lax.fori_loop(
            0, n + 1, search_body, state, unroll=_UNROLL)

        def aug_body(_, s):
            p, j0, done = s
            j1 = way[j0]
            p2 = p.at[j0].set(p[j1])
            return (jnp.where(done, p, p2), jnp.where(done, j0, j1), done | (j1 == 0))

        # the augmenting path visits distinct columns: at most n+1 hops
        p, _, _ = jax.lax.fori_loop(0, n + 1, aug_body, (p, j0, jnp.bool_(False)),
                                    unroll=_UNROLL)
        return (u, v, p), None

    (_, _, p), _ = jax.lax.scan(assign_row, (u0, v0, p0), jnp.arange(1, n + 1, dtype=jnp.int32))

    # p[j] = row matched to col j (1-indexed)  ->  col[i] (0-indexed)
    return jnp.zeros(n, jnp.int32).at[p[1:] - 1].set(jnp.arange(n, dtype=jnp.int32))


batched_linear_sum_assignment = jax.vmap(linear_sum_assignment)
