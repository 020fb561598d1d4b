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

Round-4 rework: the batched TPU path is a Pallas kernel that solves 8 LAPs
per grid step with the batch laid out across the *sublanes* of native
(8, 128) f32 VPU tiles (columns in lanes, per-problem scalars as (8, 1)
columns). All gathers become one-hot mask-reductions, so the kernel contains
zero scalar extractions and zero dynamic indexing — the exact shapes Mosaic
vectorizes. Measured on v5e (B=8, n=30, dependency-chained wall time):
3.07 ms/call vs 6.08 ms for the fixed-trip XLA formulation above, which
remains the CPU / large-n fallback. The batched entry point is wrapped in
`custom_partitioning` (batch-dim rule) so the kernel shards over the `data`
axis of a training mesh instead of forcing GSPMD to replicate it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from diffusiondrive_tpu.ops.batch_partition import batch_partitioned

# python float, not jnp.float32(...): a concrete jax Array at module scope
# becomes a captured jaxpr const, which custom_partitioning disallows.
_INF = 1e18

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


_vmapped_linear_sum_assignment = jax.vmap(linear_sum_assignment)

# ---------------------------------------------------------------------------
# Pallas TPU kernel: 8 LAPs per grid step, batch in sublanes.
# ---------------------------------------------------------------------------

_BB = 8      # LAPs per grid step = sublane count of an f32 tile
_ROWS = 32   # padded row count; solvable n <= _ROWS - 1
_COLS = 128  # padded column count; requires n <= _COLS - 1
_PINF = 1e18  # python float: a jnp scalar would be a captured kernel constant


def _lap_kernel(cpad_ref, p_ref, *, n: int):
    """Jonker-Volgenant over 8 problems at once; same algorithm as
    `linear_sum_assignment` above with every per-problem vector laid out as a
    row of an (8, 128) tile and every per-problem scalar as an (8, 1) column.
    Scalar gathers (p[j0], u[i0], cost row i0) are one-hot mask-reductions."""
    f32 = jnp.float32
    cpad = cpad_ref[:]  # (8, 32, 128); [:, 1:n+1, 1:n+1] = costs
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BB, _COLS), 1).astype(f32)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (_BB, _ROWS, 1), 1).astype(f32)
    colpad = (lane == 0.0) | (lane > n)  # virtual col 0 + padding: unselectable
    # Loop-carry initializers must start in a fully strided (non-replicated)
    # vector layout: the loop bodies compute strided values and Mosaic cannot
    # relayout strided -> replicated ("Invalid relayout: Non-singleton logical
    # dimension is replicated in destination but not in source"). `lane` alone
    # is sublane-replicated (iota along dim 1 only), so mix in a dim-0 iota.
    sub = jax.lax.broadcasted_iota(jnp.int32, (_BB, _COLS), 0).astype(f32)
    zeros2d = (sub + lane) * 0.0          # (8,128) strided in both dims
    lane_s = lane + zeros2d               # strided copy of lane
    subcol = jax.lax.broadcasted_iota(jnp.int32, (_BB, 1), 0).astype(f32)
    zeros_col = subcol * 0.0              # (8,1) f32 zero, strided
    # `done` flags are f32 0/1 columns, not bools: vector<8x1xi1> loop
    # carries fail Mosaic's scf.for legalization.

    def assign_row(i, uvp):
        u, v, p = uvp  # each (8, 128)
        p = jnp.where(lane == 0.0, i.astype(f32), p)  # p[:, 0] = i

        def search_body(_, st):
            u, v, minv, used, urow, way, oj0, done = st
            used2 = jnp.maximum(used, oj0)
            i0 = jnp.sum(p * oj0, axis=1, keepdims=True)        # (8,1) row @ j0
            oi0 = (lane == i0).astype(f32)                      # (8,128)
            urow2 = jnp.maximum(urow, oi0)
            rowmask = (rowid == i0[:, :, None]).astype(f32)     # (8,32,1)
            crow = jnp.sum(cpad * rowmask, axis=1)              # (8,128)
            ui0 = jnp.sum(u * oi0, axis=1, keepdims=True)       # (8,1)
            cur = crow - ui0 - v
            live = (used2 == 0.0) & (cur < minv)
            minv2 = jnp.where(live, cur, minv)
            j0s = jnp.sum(lane * oj0, axis=1, keepdims=True)    # (8,1)
            way2 = jnp.where(live, j0s, way)
            masked = jnp.where((used2 > 0.0) | colpad, _PINF, minv2)
            delta = jnp.min(masked, axis=1, keepdims=True)      # (8,1)
            j1 = jnp.min(jnp.where(masked == delta, lane, f32(_COLS)),
                         axis=1, keepdims=True)                 # (8,1)
            oj1 = (lane == j1).astype(f32)
            u2 = jnp.where(urow2 > 0.0, u + delta, u)
            v2 = jnp.where(used2 > 0.0, v - delta, v)
            minv3 = jnp.where(used2 > 0.0, minv2, minv2 - delta)
            pj1 = jnp.sum(p * oj1, axis=1, keepdims=True)       # (8,1)
            done2 = jnp.maximum(done, (pj1 == 0.0).astype(f32))
            sel = lambda frozen, live_: jnp.where(done > 0.0, frozen, live_)
            return (sel(u, u2), sel(v, v2), sel(minv, minv3), sel(used, used2),
                    sel(urow, urow2), sel(way, way2),
                    jnp.where(done > 0.0, oj0, oj1), done2)

        st = (u, v, zeros2d + _PINF, zeros2d, zeros2d, zeros2d,
              (lane_s == 0.0).astype(f32), zeros_col)
        u, v, _, _, _, way, oj0, _ = jax.lax.fori_loop(0, n + 1, search_body, st)

        def aug_body(_, s):
            p, oj0, done = s
            j1 = jnp.sum(way * oj0, axis=1, keepdims=True)      # (8,1)
            oj1 = (lane == j1).astype(f32)
            pj1 = jnp.sum(p * oj1, axis=1, keepdims=True)
            p2 = jnp.where(oj0 > 0.0, pj1, p)
            return (jnp.where(done > 0.0, p, p2),
                    jnp.where(done > 0.0, oj0, oj1),
                    jnp.maximum(done, (j1 == 0.0).astype(f32)))

        p, _, _ = jax.lax.fori_loop(0, n + 1, aug_body, (p, oj0, zeros_col))
        return (u, v, p)

    _, _, p = jax.lax.fori_loop(
        1, n + 1, assign_row, (zeros2d, zeros2d, zeros2d))
    p_ref[:] = p


def _lsa_pallas(cost: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(B, n, n) -> (B, n) int32 via the Pallas kernel; requires n <= 31."""
    B, n, _ = cost.shape
    bpad = (-B) % _BB
    cpad = jnp.zeros((B + bpad, _ROWS, _COLS), jnp.float32)
    cpad = cpad.at[:B, 1:n + 1, 1:n + 1].set(cost.astype(jnp.float32))
    p = pl.pallas_call(
        functools.partial(_lap_kernel, n=n),
        grid=((B + bpad) // _BB,),
        in_specs=[pl.BlockSpec((_BB, _ROWS, _COLS), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BB, _COLS), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B + bpad, _COLS), jnp.float32),
        interpret=interpret,
    )(cpad)
    pj = p[:B, 1:n + 1].astype(jnp.int32)  # row (1-indexed) matched to col j
    return jnp.zeros((B, n), jnp.int32).at[
        jnp.arange(B)[:, None], pj - 1
    ].set(jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (B, n)))


def _lsa_local(cost: jnp.ndarray) -> jnp.ndarray:
    """Per-shard solver: Pallas on TPU for kernel-supported sizes, else XLA."""
    n = cost.shape[-1]
    if jax.default_backend() == "tpu" and 1 <= n <= _ROWS - 1:
        return _lsa_pallas(cost)
    return _vmapped_linear_sum_assignment(cost)


_lsa_batch_partitioned = batch_partitioned(
    _lsa_local, batched=(0,), ndims=(3,), out_ndim=2,
    rule="B n m -> B n")  # batch-pointwise (Shardy)


def batched_linear_sum_assignment(
    cost: jnp.ndarray, use_pallas: bool | None = None
) -> jnp.ndarray:
    """Solve B independent square LAPs; returns (B, n) int32 columns.

    ``use_pallas=None`` (default) picks the TPU Pallas kernel when the
    platform and size support it, the vmapped XLA solver otherwise, and keeps
    the choice shardable over the batch dim inside pjit-partitioned programs
    via `custom_partitioning` (each shard solves only its own rows — GSPMD
    cannot partition a Mosaic custom call by itself and would otherwise
    replicate the whole batch onto every device).
    """
    if use_pallas is True:
        return _lsa_pallas(cost)
    if use_pallas is False:
        return _vmapped_linear_sum_assignment(cost)
    return _lsa_batch_partitioned(cost)
