"""Planner-forward device profiler: per-component time table.

The methodology of `docs/profiling.md` as a command: jit the production eval
forward (2-step truncated DDIM, bf16), trace N launches, join the device
timeline to the compiled HLO's op metadata, and print ms/launch per model
component. Use it to re-check the profile after any model/kernel change.

The reference has no equivalent (it declares pyinstrument and never wires
it, SURVEY §5.1); this replaces eyeballing nsys/torch-profiler dumps.

Example:
    python -m diffusiondrive_tpu.script.run_profile --batch 16 --depth 2
"""

from __future__ import annotations

import argparse
import json
import logging


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--launches", type=int, default=4)
    parser.add_argument("--depth", type=int, default=2,
                        help="module-path depth for the component buckets")
    parser.add_argument("--trace-dir", default="/tmp/jax-trace")
    parser.add_argument("--train", action="store_true",
                        help="profile one training step instead of the eval forward")
    parser.add_argument("--json", action="store_true", help="emit one JSON line")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusiondrive_tpu.models.config import TransfuserConfig
    from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
    from diffusiondrive_tpu.utils.profiling import profile_jitted

    config = TransfuserConfig()
    B = args.batch

    if args.train:
        from jax.sharding import Mesh

        from diffusiondrive_tpu.training.train import (
            OptimizerConfig,
            create_train_state,
            make_train_step,
            replicate_state,
        )

        model = DiffusionDriveModel(config, dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        batch = {
            "camera_feature": rng.normal(size=(B, config.camera_height, config.camera_width, 3)).astype(np.float32),
            "lidar_feature": rng.normal(size=(B, config.lidar_resolution_height, config.lidar_resolution_width, config.lidar_in_channels)).astype(np.float32),
            "status_feature": rng.normal(size=(B, 8)).astype(np.float32),
            "trajectory": rng.normal(size=(B, config.num_poses, 3)).astype(np.float32),
            "agent_states": rng.normal(size=(B, config.num_bounding_boxes, 5)).astype(np.float32),
            "agent_labels": (rng.uniform(size=(B, config.num_bounding_boxes)) > 0.5).astype(np.float32),
            "bev_semantic_map": rng.integers(0, 7, size=(B,) + config.bev_semantic_frame).astype(np.int32),
        }
        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, OptimizerConfig())
        state = replicate_state(state, mesh)
        batch_dev = {k: jax.device_put(jnp.asarray(v)) for k, v in batch.items()}
        key = jax.random.PRNGKey(1)

        # profile_jitted re-calls fn with the SAME args, so profile a
        # non-donating jit of the step (donation would invalidate `state`
        # after the first launch; the compute being measured is identical —
        # `shard_train_step` only adds shardings/donation on top)
        step_nodonate = jax.jit(make_train_step(model, config, tx))
        table = profile_jitted(step_nodonate, state, batch_dev, key,
                               launches=args.launches, depth=args.depth,
                               trace_dir=args.trace_dir)
    else:
        model = DiffusionDriveModel(config, dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        camera = jnp.zeros((B, config.camera_height, config.camera_width, 3), jnp.float32)
        lidar = jnp.zeros((B, config.lidar_resolution_height, config.lidar_resolution_width,
                           config.lidar_in_channels), jnp.float32)
        status = jnp.zeros((B, 8), jnp.float32)
        variables = jax.jit(model.init)(
            {"params": rng, "diffusion": rng, "dropout": rng}, camera, lidar, status)

        @jax.jit
        def jit_forward(variables, camera, lidar, status):
            return model.apply(variables, camera, lidar, status,
                               rngs={"diffusion": jax.random.PRNGKey(7)})

        table = profile_jitted(jit_forward, variables, camera, lidar, status,
                               launches=args.launches, depth=args.depth,
                               trace_dir=args.trace_dir)

    if args.json:
        print(json.dumps({"batch": B, "ms_per_launch": table}))
        return
    total = sum(table.values())
    print(f"device time per launch (batch {B}): {total:.2f} ms")
    for name, ms in table.items():
        print(f"  {ms:8.3f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name}")
    if not table:
        print("  (no device timeline captured — CPU backend traces host events only)")


if __name__ == "__main__":
    main()
