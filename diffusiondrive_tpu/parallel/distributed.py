"""Multi-host initialization.

The reference reaches multi-node via SLURM env vars + Ray head/redis
(`worker_ray_no_torch.py:42-73`) for eval and Lightning `num_nodes` for
training. On TPU pods both collapse into `jax.distributed.initialize()` —
after which `jax.devices()` spans the slice, the same mesh/sharding code
scales over ICI+DCN, and host-side IO shards by `jax.process_index()`.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple:
    """Initialize multi-host JAX when running on a pod slice.

    No-ops on single-host. Returns (process_index, process_count).
    """
    import jax

    env_says_multihost = any(
        os.environ.get(k) for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address or num_processes or env_says_multihost:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "distributed: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), jax.device_count(),
        )
    return jax.process_index(), jax.process_count()


def host_shard_info() -> tuple:
    """(host_id, num_hosts) for token/log sharding — env override first
    (HOST_ID/NUM_HOSTS), else the JAX process topology."""
    import jax

    host_id = int(os.environ.get("HOST_ID", jax.process_index()))
    num_hosts = int(os.environ.get("NUM_HOSTS", jax.process_count()))
    return host_id, num_hosts
