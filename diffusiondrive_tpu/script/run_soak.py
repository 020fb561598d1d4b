"""Sustained-training soak: 200+ device-resident steps on the full-size config.

The reference trains 100 epochs under Lightning (`default_training.yaml:25-44`);
this repo's trainer-at-scale behavior (compile cache stability, donation+EMA
memory path, metrics sink, checkpoint cadence) needs proof beyond the
6-step SPMD demo. This script runs the production-size model
(resnet34 x2, 60.7M params, bf16-mixed, EMA 0.999, donated state) for
`--steps` steps over a small FIXED pool of synthetic cached-feature batches
(device-resident: the pool is uploaded once; cycling it re-uses committed
arrays so `shard_batch` is a no-op), checkpoints every `--checkpoint-every`
steps via the Trainer's epoch hook, then asserts:

- the jitted step compiled exactly once (no recompiles after step 1),
- loss decreased "monotone-ish": last-K mean < first-K mean, and the
  windowed means are non-increasing within a tolerance,
- step time is stable: each post-warmup window's wall time is within
  `--time-tol` of the median window,
- `metrics.jsonl` holds exactly one well-formed row per step with finite
  loss components,
- every expected checkpoint directory exists and the final one restores.

Emits one JSON summary line (and writes it next to the checkpoints) so the
run leaves an artifact for docs.

Usage:
    python -m diffusiondrive_tpu.script.run_soak --steps 200 --batch 8
    # quick CPU smoke (tiny model; --cpu because this image's sitecustomize
    # pins JAX_PLATFORMS=axon, so the env var alone does NOT force CPU):
    python -m diffusiondrive_tpu.script.run_soak --cpu --tiny --steps 12 --checkpoint-every 6
"""

from __future__ import annotations

import argparse
import json
import logging
import shutil
import time
from pathlib import Path

logger = logging.getLogger(__name__)


def _make_batch_pool(config, batch: int, pool: int, seed: int = 0):
    """A fixed pool of synthetic cached-feature batches (the shapes the
    feature/target builders produce, `training/dataset.py`). Fixed so the
    model can fit them and the loss trend is a real signal."""
    import numpy as np

    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(pool):
        batches.append({
            "camera_feature": rng.normal(size=(batch, config.camera_height, config.camera_width, 3)).astype(np.float32),
            "lidar_feature": (rng.uniform(size=(batch, config.lidar_resolution_height,
                                                config.lidar_resolution_width,
                                                config.lidar_in_channels)) < 0.02).astype(np.float32),
            "status_feature": rng.normal(size=(batch, 8)).astype(np.float32),
            "trajectory": rng.normal(scale=5.0, size=(batch, config.num_poses, 3)).astype(np.float32),
            "agent_states": rng.normal(scale=3.0, size=(batch, config.num_bounding_boxes, 5)).astype(np.float32),
            "agent_labels": (rng.uniform(size=(batch, config.num_bounding_boxes)) > 0.5).astype(np.float32),
            "bev_semantic_map": rng.integers(0, config.num_bev_classes,
                                             size=(batch,) + config.bev_semantic_frame).astype(np.int32),
        })
    return batches


def run_soak(steps: int = 200, batch: int = 8, pool: int = 4, checkpoint_every: int = 50,
             output_dir: str = "/tmp/dd_soak", tiny: bool = False, ema: bool = True,
             time_tol: float = 0.35, seed: int = 0) -> dict:
    import jax
    import numpy as np

    if steps <= 0 or steps % checkpoint_every != 0:
        raise ValueError(
            f"--steps ({steps}) must be a positive multiple of "
            f"--checkpoint-every ({checkpoint_every})")

    from diffusiondrive_tpu.models.config import TransfuserConfig
    from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
    from diffusiondrive_tpu.parallel.mesh import create_mesh, shard_batch
    from diffusiondrive_tpu.training.train import OptimizerConfig
    from diffusiondrive_tpu.training.trainer import Trainer

    import jax.numpy as jnp

    if tiny:
        config = TransfuserConfig(
            image_architecture="resnet18", lidar_architecture="resnet18",
            camera_height=64, camera_width=256,
            lidar_resolution_height=64, lidar_resolution_width=64,
            img_vert_anchors=2, img_horz_anchors=8,
            lidar_vert_anchors=2, lidar_horz_anchors=2,
            bev_pixel_height=32, bev_pixel_width=64,
            tf_d_model=64, tf_d_ffn=128, tf_num_layers=1, tf_num_head=4,
            num_bounding_boxes=4,
        )
    else:
        config = TransfuserConfig()

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    metrics_path = out / "metrics.jsonl"
    if metrics_path.exists():
        metrics_path.unlink()  # the integrity check below wants this run only
    for stale in out.glob("epoch_*"):  # ditto the checkpoint count + restore
        shutil.rmtree(stale)

    model = DiffusionDriveModel(config, dtype=jnp.bfloat16)
    opt_cfg = OptimizerConfig(steps_per_epoch=checkpoint_every,
                              epochs=steps // checkpoint_every,
                              ema_decay=0.999 if ema else None)
    mesh = create_mesh()
    trainer = Trainer(model, config, opt_cfg, output_dir=str(out), mesh=mesh, seed=seed)

    host_pool = _make_batch_pool(config, batch, pool, seed)
    trainer.setup(host_pool[0])
    # upload the pool ONCE; cycling device-resident batches keeps the tunnel
    # out of the steady-state step (host->device is ~50 MB/s here)
    device_pool = [shard_batch(b, mesh) for b in host_pool]

    num_epochs = steps // checkpoint_every
    epoch_walls: list[float] = []

    class _EpochTimer:
        def on_epoch_start(self, split, epoch):
            if split == "train":
                self._t0 = time.perf_counter()

        def on_epoch_end(self, split, epoch):
            if split == "train":
                epoch_walls.append(time.perf_counter() - self._t0)

    trainer.callbacks.append(_EpochTimer())

    def train_batches(epoch: int):
        for i in range(checkpoint_every):
            yield device_pool[(epoch * checkpoint_every + i) % len(device_pool)]

    t_start = time.perf_counter()
    state = trainer.fit(train_batches, num_epochs=num_epochs, log_every=checkpoint_every,
                        checkpoint_every_epochs=1)
    wall = time.perf_counter() - t_start

    # ---- assertions -------------------------------------------------------
    failures: list[str] = []

    # `_cache_size` is a private jax.jit internal; degrade to "unknown" (and
    # skip the recompile check) if a JAX upgrade removes it.
    cache_size_fn = getattr(trainer._step_fn, "_cache_size", None)
    cache_size = cache_size_fn() if callable(cache_size_fn) else "unknown"
    if cache_size != "unknown" and cache_size != 1:
        failures.append(f"train step compiled {cache_size} times (expected 1)")

    rows = [json.loads(line) for line in metrics_path.read_text().splitlines()]
    train_rows = [r for r in rows if r["split"] == "train"]
    if len(train_rows) != steps:
        failures.append(f"metrics.jsonl has {len(train_rows)} train rows (expected {steps})")
    if [r["step"] for r in train_rows] != list(range(1, steps + 1)):
        failures.append("metrics.jsonl steps are not contiguous 1..N")
    losses = np.array([r["loss"] for r in train_rows], np.float64)
    if not np.all(np.isfinite([v for r in train_rows for v in r.values()
                               if isinstance(v, float)])):
        failures.append("non-finite loss component in metrics.jsonl")

    k = max(5, steps // 20)
    first_k, last_k = float(losses[:k].mean()), float(losses[-k:].mean())
    if not last_k < first_k:
        failures.append(f"loss did not decrease: first-{k} mean {first_k:.2f} vs last-{k} {last_k:.2f}")
    # monotone-ish: each fifth-of-the-run window no worse than the previous +2%.
    # Only meaningful when each window averages enough steps to beat batch
    # noise — short smoke runs keep just the first/last-K decrease check.
    windows = [float(w.mean()) for w in np.array_split(losses, 5)]
    if steps >= 50:
        for a, b in zip(windows, windows[1:]):
            if b > a * 1.02:
                failures.append(f"loss window regressed: {a:.2f} -> {b:.2f} (windows {['%.1f' % w for w in windows]})")
                break

    # step-time stability: epoch 1 carries the compile; epochs 2..N must sit
    # within time_tol of their median
    steady = epoch_walls[1:]
    med = float(np.median(steady)) if steady else 0.0
    for i, w in enumerate(steady, start=2):
        if med and abs(w - med) > time_tol * med:
            failures.append(f"epoch {i} wall {w:.2f}s deviates >{time_tol:.0%} from median {med:.2f}s")

    ckpts = sorted(p.name for p in out.glob("epoch_*"))
    if len(ckpts) != num_epochs:
        failures.append(f"expected {num_epochs} checkpoints, found {ckpts}")
    else:
        trainer.restore_checkpoint(str(out / ckpts[-1]))
        if int(trainer.state.step) != steps:
            failures.append(f"restored step {int(trainer.state.step)} != {steps}")

    summary = {
        "steps": steps, "batch": batch, "tiny": tiny, "ema": ema,
        "wall_s": round(wall, 2),
        "steady_ms_per_step": round(1000.0 * med / checkpoint_every, 2) if steady else None,
        "epoch_walls_s": [round(w, 2) for w in epoch_walls],
        "loss_first": round(float(losses[0]), 3), "loss_last": round(float(losses[-1]), 3),
        "loss_first_k": round(first_k, 3), "loss_last_k": round(last_k, 3),
        "loss_windows": [round(w, 2) for w in windows],
        "compile_cache_size": cache_size,
        "checkpoints": ckpts,
        "device": str(jax.devices()[0]),
        "ok": not failures, "failures": failures,
    }
    (out / "soak_summary.json").write_text(json.dumps(summary, indent=2))
    del state
    return summary


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--pool", type=int, default=4, help="distinct synthetic batches cycled")
    parser.add_argument("--checkpoint-every", type=int, default=50)
    parser.add_argument("--output-dir", default="/tmp/dd_soak")
    parser.add_argument("--tiny", action="store_true", help="tiny model for CPU smoke runs")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (this image pins JAX_PLATFORMS=axon)")
    parser.add_argument("--no-ema", action="store_true")
    parser.add_argument("--time-tol", type=float, default=0.35)
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    summary = run_soak(steps=args.steps, batch=args.batch, pool=args.pool,
                       checkpoint_every=args.checkpoint_every, output_dir=args.output_dir,
                       tiny=args.tiny, ema=not args.no_ema, time_tol=args.time_tol)
    print(json.dumps(summary))
    raise SystemExit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
