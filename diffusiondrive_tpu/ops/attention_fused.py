"""Fused self-attention Pallas kernel for the GPT fusion blocks.

STATUS: measured-and-REJECTED for the default path (kept opt-in +
interpret-tested). Hypothesis was that the backbone's 8 fusion blocks
(`models/backbone.py:GPTSelfAttention`, parity
`transfuser_backbone.py:365-409`) pay a (B, H, T, T) HBM round trip in
XLA's einsum path (52 MB bf16 at batch 64). The T=320 score matrix fits
VMEM, so this kernel computes scores -> softmax -> (dropout) -> output per
batch grid step without materializing probabilities in HBM; the custom VJP
recomputes them in the backward kernel (flash-attention recomputation,
specialized to a single un-tiled T<=512 block). The TPU A/B
(docs/profiling.md round 5) shows XLA's fusion already sits at the same
~1 ms floor — the op is VPU-softmax/small-matmul bound at this shape, not
HBM bound — and the kernel loses 10-40% (fwd 1.14-1.43 vs ~1.0 ms, fwd+bwd
1.50 vs 1.28 ms), so `fused_attention_mode="auto"` stays on XLA.

Dropout: the reference applies `attn_pdrop` to the softmax output. The keep
mask is generated OUTSIDE the kernel (threefry via `dropout_keep_mask`) and
passed as a uint8 operand rather than drawn in-kernel from the TPU PRNG:
threefry is identical on every backend and invariant to mesh sharding, which
keeps the 1-vs-8-device train-step equivalence exact and lets the CPU
interpret path test the real kernel; the backward pass reuses the same mask.
A (B, H, T, T) uint8 mask is 26 MB at batch 64 — two orders of magnitude
less traffic than the f32 intermediates it replaces.

Sharding: every operand carries the batch in dim 0, so the kernels wrap in
`batch_partitioned` (the backward uses its multi-result form) and shard over
whatever mesh axis the caller's batch sharding names.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusiondrive_tpu.ops.batch_partition import batch_partitioned

# VMEM budget: the backward kernel holds ~5 f32 (T, T) temporaries.
_MAX_T = 512


def supports_fused_attention(T: int, d_head: int) -> bool:
    """Eligibility: one un-tiled (T, T) block must fit VMEM."""
    return 8 <= T <= _MAX_T and T % 8 == 0 and 8 <= d_head <= 256


def dropout_keep_mask(rng: jax.Array, shape, pdrop: float) -> jnp.ndarray:
    """uint8 keep mask (1 = keep), P(keep) = 1 - pdrop, threefry-generated."""
    return jax.random.bernoulli(rng, 1.0 - pdrop, shape).astype(jnp.uint8)


def _softmax_f32(s: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _probs(q, k, mask, sm_scale, inv_keep):
    """f32 (T, T) attention probabilities for one (batch, head) step."""
    s = _dot(q, k, ((1,), (1,))) * sm_scale
    p = _softmax_f32(s)
    if mask is not None:
        p = jnp.where(mask != 0, p * inv_keep, 0.0)
    return p


def _fwd_kernel(*refs, sm_scale, inv_keep, masked):
    if masked:
        q_ref, k_ref, v_ref, m_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        m_ref = None
    for h in range(q_ref.shape[1]):
        q, k, v = q_ref[0, h], k_ref[0, h], v_ref[0, h]
        p = _probs(q, k, None if m_ref is None else m_ref[0, h], sm_scale,
                   inv_keep)
        o = _dot(p.astype(q.dtype), v, ((1,), (0,)))
        o_ref[0, h] = o.astype(o_ref.dtype)


def _bwd_kernel(*refs, sm_scale, inv_keep, masked):
    if masked:
        q_ref, k_ref, v_ref, m_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
    else:
        q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
        m_ref = None
    for h in range(q_ref.shape[1]):
        q, k, v, do = q_ref[0, h], k_ref[0, h], v_ref[0, h], do_ref[0, h]
        keep = None if m_ref is None else (m_ref[0, h] != 0)

        s = _dot(q, k, ((1,), (1,))) * sm_scale
        p = _softmax_f32(s)
        pd = p if keep is None else jnp.where(keep, p * inv_keep, 0.0)

        dv = _dot(pd.astype(q.dtype), do, ((0,), (0,)))
        dpd = _dot(do, v, ((1,), (1,)))
        dp = dpd if keep is None else jnp.where(keep, dpd * inv_keep, 0.0)
        ds = (p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))) * sm_scale
        dsc = ds.astype(q.dtype)

        dq_ref[0, h] = _dot(dsc, k, ((1,), (0,))).astype(dq_ref.dtype)
        dk_ref[0, h] = _dot(dsc, q, ((0,), (0,))).astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _specs(B, H, T, D, masked, n_qkv):
    """Block specs: one (batch, ALL heads) slice per grid step.

    Grid is (B,) with the whole head dim in-block (statically unrolled in
    the kernels): at the fusion-block shape the per-(b, h) grid was 256
    steps of ~4.5 us, dominated by grid-step overhead, not compute.
    """
    bh = lambda b: (b, 0, 0, 0)
    specs = [pl.BlockSpec((1, H, T, D), bh, memory_space=pltpu.VMEM)
             for _ in range(n_qkv)]
    if masked:
        specs.append(pl.BlockSpec((1, H, T, T), bh, memory_space=pltpu.VMEM))
    return specs, bh


def _fwd_pallas(q, k, v, mask, sm_scale, pdrop, interpret=False):
    interpret = interpret or jax.default_backend() != "tpu"
    B, H, T, D = q.shape
    masked = mask is not None
    in_specs, bh = _specs(B, H, T, D, masked, 3)
    kern = functools.partial(_fwd_kernel, sm_scale=sm_scale,
                             inv_keep=1.0 / (1.0 - pdrop), masked=masked)
    ops = (q, k, v, mask) if masked else (q, k, v)
    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, T, D), bh, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=interpret,
    )(*ops)


def _bwd_pallas(q, k, v, mask, do, sm_scale, pdrop, interpret=False):
    interpret = interpret or jax.default_backend() != "tpu"
    B, H, T, D = q.shape
    masked = mask is not None
    in_specs, bh = _specs(B, H, T, D, masked, 3)
    in_specs.append(pl.BlockSpec((1, H, T, D), bh, memory_space=pltpu.VMEM))
    kern = functools.partial(_bwd_kernel, sm_scale=sm_scale,
                             inv_keep=1.0 / (1.0 - pdrop), masked=masked)
    ops = (q, k, v, mask, do) if masked else (q, k, v, do)
    grad = jax.ShapeDtypeStruct((B, H, T, D), q.dtype)
    out_spec = pl.BlockSpec((1, H, T, D), bh, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(grad, grad, grad),
        interpret=interpret,
    )(*ops)


# Sharded wrappers: the mask variants reorder `mask` to the front-adjacent
# operand list; statics (sm_scale, pdrop, interpret) trail per the
# batch_partitioned contract.
_QKV = "b h t d, b h t d, b h t d"
_G3 = "b h t d, b h t d, b h t d"

_fwd_sharded = batch_partitioned(
    lambda q, k, v, sm_scale, pdrop, interpret:
        _fwd_pallas(q, k, v, None, sm_scale, pdrop, interpret),
    batched=(0, 1, 2), ndims=(4, 4, 4), out_ndim=4,
    rule=f"{_QKV} -> b h t d", static_argnums=(3, 4, 5))

_fwd_mask_sharded = batch_partitioned(
    lambda q, k, v, m, sm_scale, pdrop, interpret:
        _fwd_pallas(q, k, v, m, sm_scale, pdrop, interpret),
    batched=(0, 1, 2, 3), ndims=(4, 4, 4, 4), out_ndim=4,
    rule=f"{_QKV}, b h t s -> b h t d", static_argnums=(4, 5, 6))

_bwd_sharded = batch_partitioned(
    lambda q, k, v, do, sm_scale, pdrop, interpret:
        _bwd_pallas(q, k, v, None, do, sm_scale, pdrop, interpret),
    batched=(0, 1, 2, 3), ndims=(4, 4, 4, 4), out_ndim=(4, 4, 4),
    rule=f"{_QKV}, b h t d -> {_G3}", static_argnums=(4, 5, 6))

_bwd_mask_sharded = batch_partitioned(
    lambda q, k, v, m, do, sm_scale, pdrop, interpret:
        _bwd_pallas(q, k, v, m, do, sm_scale, pdrop, interpret),
    batched=(0, 1, 2, 3, 4), ndims=(4, 4, 4, 4, 4), out_ndim=(4, 4, 4),
    rule=f"{_QKV}, b h t s, b h t d -> {_G3}", static_argnums=(5, 6, 7))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray], pdrop: float = 0.0,
                    interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) [dropout] v, fused per (batch, head).

    q, k, v: (B, H, T, D); mask: optional (B, H, T, T) uint8 keep mask from
    `dropout_keep_mask` (required iff pdrop > 0 — kept probabilities are
    rescaled by 1/(1-pdrop) like `nn.Dropout`). Returns (B, H, T, D) in
    q.dtype; scores/softmax accumulate in f32 inside the kernel.
    """
    return _attention_fwd(q, k, v, mask, pdrop, interpret)[0]


def _attention_fwd(q, k, v, mask, pdrop, interpret):
    if mask is None:
        out = _fwd_sharded(q, k, v, _sm_scale(q), pdrop, interpret)
    else:
        out = _fwd_mask_sharded(q, k, v, mask, _sm_scale(q), pdrop, interpret)
    return out, (q, k, v, mask)


def _attention_bwd(pdrop, interpret, res, g):
    q, k, v, mask = res
    if mask is None:
        dq, dk, dv = _bwd_sharded(q, k, v, g, _sm_scale(q), pdrop, interpret)
        return dq, dk, dv, None
    dq, dk, dv = _bwd_mask_sharded(q, k, v, mask, g, _sm_scale(q), pdrop,
                                   interpret)
    return dq, dk, dv, np.zeros(mask.shape, jax.dtypes.float0)


fused_attention.defvjp(_attention_fwd, _attention_bwd)


def _sm_scale(q: jnp.ndarray) -> float:
    return float(1.0 / np.sqrt(q.shape[-1]))
