"""Benchmark: planner frames/sec per chip on real hardware.

Headline metric vs the reference's 45 FPS single-frame planner speed on an
RTX 4090 (`/root/reference/README.md:36`, BASELINE.md). Measures the full
jitted planner forward — Transfuser backbone + GPT fusion + transformer
decoder + 2-step truncated-DDIM diffusion decode — at the production input
resolution (camera 256x1024, lidar BEV 256x256), bf16 compute.

Prints ONE JSON line:
  {"metric": "planner_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 45}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 45.0  # reference: 45 FPS on RTX 4090


def main() -> None:
    from __graft_entry__ import entry

    forward, (variables, camera, lidar, status) = entry()
    fn = jax.jit(forward)

    # Warm-up / compile
    out = fn(variables, camera, lidar, status)
    jax.block_until_ready(out)

    # Single-frame latency benchmark (batch=1, matching the reference's
    # real-time planner measurement).
    iters = 50
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, camera, lidar, status)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    fps = iters / elapsed

    # Throughput at batch 16 (the deployment-relevant number) as extra info.
    B = 16
    camera_b = jnp.broadcast_to(camera, (B,) + camera.shape[1:])
    lidar_b = jnp.broadcast_to(lidar, (B,) + lidar.shape[1:])
    status_b = jnp.broadcast_to(status, (B,) + status.shape[1:])
    out = fn(variables, camera_b, lidar_b, status_b)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(10):
        out = fn(variables, camera_b, lidar_b, status_b)
    jax.block_until_ready(out)
    batch_fps = 10 * B / (time.perf_counter() - start)

    print(
        json.dumps(
            {
                "metric": "planner_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "extra": {
                    "batch16_throughput_fps": round(batch_fps, 2),
                    "baseline_fps": BASELINE_FPS,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
