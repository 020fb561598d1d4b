"""diffusiondrive_tpu — a TPU-native (JAX/XLA/Pallas) end-to-end driving framework.

A from-scratch rebuild of the capabilities of the DiffusionDrive/NAVSIM stack
(reference: seulbinHwang/DiffusionDrive) designed TPU-first:

- the planner (multi-sensor fusion backbone + truncated-diffusion trajectory
  decoder) is a single jitted XLA program with bf16 matmuls on the MXU,
- preprocessing (camera stitch/resize, lidar point->BEV splat) runs as fused
  device kernels,
- the PDM evaluation engine (LQR-tracked kinematic-bicycle re-simulation +
  closed-loop scoring) is batch-vectorized so thousands of scenes score in one
  XLA launch, sharded data-parallel over a `jax.sharding.Mesh`,
- training is a pjit data-parallel loop with optax/orbax.
"""

__version__ = "0.1.0"
