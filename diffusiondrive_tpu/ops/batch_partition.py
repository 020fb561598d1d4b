"""Shared `custom_partitioning` boilerplate for batch-pointwise Pallas ops.

Every TPU Pallas kernel in this package is batch-pointwise: the program is
independent across the leading (batch) dim of its batched operands, and every
other operand (weights, folded affines) is replicated. GSPMD cannot partition
a Mosaic custom call by itself — without these rules a pjit-sharded caller
would all-gather the batch onto every device and run the kernel replicated.

`batch_partitioned` wraps such a function once: the listed batched operands
shard on dim 0 over whatever mesh axis the caller's sharding put there, the
rest replicate, and the local (per-shard) computation is the function itself.
"""

from __future__ import annotations

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


def batch_partitioned(fn, *, batched, ndims, out_ndim, rule, static_argnums=()):
    """Wrap `fn` in `custom_partitioning` with a leading-batch-dim rule.

    Args:
      fn: positional-args function; any static args must be TRAILING (they are
        re-bound on the right of the per-shard call).
      batched: indices of operands sharded on dim 0 (index 0 must be one).
      ndims: rank of each non-static operand, in order.
      out_ndim: rank of the result, or a tuple of ranks for a multi-result
        fn; every result's dim 0 shards like the input.
      rule: Shardy sharding rule string (einsum-like; comma-separated results
        for multi-result fns).
      static_argnums: forwarded to `custom_partitioning`.
    """
    assert 0 in batched, "operand 0 must be batched (it defines the axis)"
    wrapped = custom_partitioning(fn, static_argnums=static_argnums)
    multi = isinstance(out_ndim, tuple)
    out_ndims = out_ndim if multi else (out_ndim,)

    def _axis(arg_infos):
        spec = getattr(arg_infos[0].sharding, "spec", None)
        return spec[0] if spec else None

    def _out_shardings(mesh, b):
        shs = tuple(NamedSharding(mesh, PartitionSpec(b, *([None] * (nd - 1))))
                    for nd in out_ndims)
        return shs if multi else shs[0]

    def _infer(*a):
        mesh, arg_infos, _ = a[-3:]
        return _out_shardings(mesh, _axis(arg_infos))

    def _partition(*a):
        static, (mesh, arg_infos, _) = a[:-3], a[-3:]
        b = _axis(arg_infos)
        arg_sh = tuple(
            NamedSharding(mesh, PartitionSpec(b, *([None] * (nd - 1))))
            if i in batched else NamedSharding(mesh, PartitionSpec(*([None] * nd)))
            for i, nd in enumerate(ndims))
        local = (lambda *ops: fn(*ops, *static)) if static else fn
        return mesh, local, _out_shardings(mesh, b), arg_sh

    wrapped.def_partition(
        partition=_partition, infer_sharding_from_operands=_infer,
        sharding_rule=rule)
    return wrapped
