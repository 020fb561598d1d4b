"""Full-size train-step timing: fp32 vs bf16-mixed on the real TPU.

Measures the production model (resnet34 x2, 256x1024 camera, ~60.7M params)
through `shard_train_step` at a given batch size in both precisions, with
dependency-chained steps and a final device->host fetch (see CLAUDE.md: the
tunneled TPU acks/elides un-fetched work). Also reports training MFU from
XLA's cost analysis of the compiled step.

Usage:
    python scripts/profiling/bf16_train_step_timing.py [--batch 8] [--steps 6]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def run_precision(dtype, batch_size: int, steps: int, peak_flops: float,
                  fused_mode: str = "auto") -> dict:
    from diffusiondrive_tpu.models.config import TransfuserConfig
    from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
    from diffusiondrive_tpu.parallel.mesh import create_mesh, shard_batch
    from diffusiondrive_tpu.training.train import (
        OptimizerConfig,
        create_train_state,
        make_train_step,
        shard_train_step,
    )

    config = TransfuserConfig(fused_conv_mode=fused_mode)
    model = DiffusionDriveModel(config, dtype=dtype)
    mesh = create_mesh(jax.devices()[:1])

    rng = np.random.default_rng(0)
    batch = {
        "camera_feature": rng.uniform(size=(batch_size, config.camera_height,
                                            config.camera_width, 3)).astype(np.float32),
        "lidar_feature": rng.uniform(size=(batch_size, config.lidar_resolution_height,
                                           config.lidar_resolution_width, 1)).astype(np.float32),
        "status_feature": rng.normal(size=(batch_size, 8)).astype(np.float32),
        "trajectory": rng.normal(scale=5.0, size=(batch_size, 8, 3)).astype(np.float32),
        "agent_states": rng.normal(scale=10.0, size=(batch_size, 30, 5)).astype(np.float32),
        "agent_labels": (rng.uniform(size=(batch_size, 30)) > 0.5).astype(np.float32),
        "bev_semantic_map": rng.integers(0, 7, size=(batch_size, 128, 256)).astype(np.int32),
    }

    with mesh:
        t0 = time.perf_counter()
        state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, OptimizerConfig())
        step = shard_train_step(make_train_step(model, config, tx), mesh)
        sharded = shard_batch(batch, mesh)
        state, metrics = step(state, sharded, jax.random.PRNGKey(1))
        first_loss = float(metrics["loss"])  # fetch = execution barrier
        compile_s = time.perf_counter() - t0

        # analytic step FLOPs for MFU (cost analysis of the compiled step)
        try:
            analysis = step.lower(state, sharded, jax.random.PRNGKey(1)).compile().cost_analysis()
            if isinstance(analysis, (list, tuple)):
                analysis = analysis[0]
            step_flops = float(analysis.get("flops", 0.0))
        except Exception:
            step_flops = 0.0

        # Warm-up: the first step() above ran with a freshly-created
        # (uncommitted) state; its OUTPUT state carries the mesh shardings, so
        # the next call retraces+recompiles — through this image's remote
        # compile service that is 200-270 s, which a 6-step average silently
        # smears into "~49 s/step" (measured round 5). Same trap with the rng
        # key: deriving it from a device value (e.g. fold_in(key, loss))
        # commits it and forces a THIRD compile. Pre-split host keys + one
        # untimed step pin the steady-state signature before timing.
        keys = jax.random.split(jax.random.PRNGKey(2), steps + 1)
        state, metrics = step(state, sharded, keys[0])
        _ = float(metrics["loss"])

        # timed: state threading makes the chain sequential (step i+1's input
        # is step i's output), and the final loss fetch forces the whole chain
        # (un-fetched work on the tunneled TPU can be elided, see CLAUDE.md)
        losses = []
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step(state, sharded, keys[i + 1])
            losses.append(metrics["loss"])
        last_loss = float(losses[-1])
        wall = time.perf_counter() - t0

    step_s = wall / steps
    return {
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "batch": batch_size,
        "compile_plus_step1_s": round(compile_s, 1),
        "steady_step_s": round(step_s, 3),
        "steps_per_s": round(1.0 / step_s, 3),
        "samples_per_s": round(batch_size / step_s, 2),
        "step_tflops": round(step_flops / 1e12, 2),
        "train_mfu": round(step_flops / step_s / peak_flops, 4) if step_flops else None,
        "first_loss": round(first_loss, 2),
        "last_loss": round(last_loss, 2),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps", type=int, default=6)
    parser.add_argument("--precisions", nargs="*", default=["bfloat16", "float32"])
    parser.add_argument("--fused-mode", default="auto", choices=["auto", "off"],
                        help="'off' disables the Pallas conv paths (XLA A/B side)")
    args = parser.parse_args()

    from bench import _peak_bf16_flops

    peak = _peak_bf16_flops(jax.devices()[0])
    results = []
    for name in args.precisions:
        res = run_precision(getattr(jnp, name), args.batch, args.steps, peak,
                            fused_mode=args.fused_mode)
        print(json.dumps(res), flush=True)
        results.append(res)
    if len(results) == 2:
        speedup = results[1]["steady_step_s"] / results[0]["steady_step_s"]
        print(json.dumps({"bf16_speedup_vs_fp32": round(speedup, 2)}))


if __name__ == "__main__":
    main()
