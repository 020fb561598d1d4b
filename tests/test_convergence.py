"""In-suite convergence proof: Trainer fit -> checkpoint -> resume -> converge.

Overfits a fixed tiny dataset with the full Trainer (jitted sharded step, EMA,
jitted test-path validation, orbax checkpointing) on a 1-device mesh — the
8-way SPMD path is covered by test_train.py and the multichip dryrun; a
single-device mesh keeps the XLA:CPU compile ~1 min instead of ~10.

Model: the real DiffusionDriveModel trunk with the deterministic MLP head
(diffusion-head training dynamics are asserted in test_train/test_diffusion_head;
the MLP head converges fast enough to prove the loop *optimizes*). One test
covers the whole lifecycle to pay the XLA compile chain once."""

import numpy as np
import jax
import jax.numpy as jnp

from diffusiondrive_tpu.agents.diffusiondrive.agent import DiffusionDriveAgent
from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
from diffusiondrive_tpu.parallel.mesh import create_mesh
from diffusiondrive_tpu.training.callbacks import BEVVisualizationCallback, TimeLoggingCallback
from diffusiondrive_tpu.training.train import OptimizerConfig
from diffusiondrive_tpu.training.trainer import Trainer

CAM_H, CAM_W, LID = 64, 256, 64


def lean_config():
    return TransfuserConfig(
        image_architecture="resnet18", lidar_architecture="resnet18",
        camera_height=CAM_H, camera_width=CAM_W,
        lidar_resolution_height=LID, lidar_resolution_width=LID,
        img_vert_anchors=2, img_horz_anchors=8,
        lidar_vert_anchors=2, lidar_horz_anchors=2,
        bev_pixel_height=LID // 2, bev_pixel_width=LID,
        tf_d_model=64, tf_d_ffn=128, tf_num_layers=1, tf_num_head=4,
        num_bounding_boxes=4,
    )


def tiny_batch(batch_size=4, seed=3):
    rng = np.random.default_rng(seed)
    return {
        "camera_feature": rng.uniform(size=(batch_size, CAM_H, CAM_W, 3)).astype(np.float32),
        "lidar_feature": rng.uniform(size=(batch_size, LID, LID, 1)).astype(np.float32),
        "status_feature": rng.normal(size=(batch_size, 8)).astype(np.float32),
        "trajectory": rng.normal(scale=5.0, size=(batch_size, 8, 3)).astype(np.float32),
        "agent_states": rng.normal(scale=10.0, size=(batch_size, 4, 5)).astype(np.float32),
        "agent_labels": (rng.uniform(size=(batch_size, 4)) > 0.5).astype(np.float32),
        "bev_semantic_map": rng.integers(0, 7, size=(batch_size, LID // 2, LID)).astype(np.int32),
    }


def test_fit_checkpoint_resume_converge(tmp_path):
    config = lean_config()
    model = DiffusionDriveModel(config, trajectory_head_type="mlp")
    mesh = create_mesh(jax.devices()[:1])
    opt = OptimizerConfig(lr=1e-3, warmup_epochs=0, epochs=10**6, steps_per_epoch=1,
                          ema_decay=0.99)
    batch = tiny_batch()

    trainer = Trainer(model, config, opt, output_dir=str(tmp_path / "ckpt"), mesh=mesh,
                      callbacks=[TimeLoggingCallback(),
                                 BEVVisualizationCallback(str(tmp_path / "viz"), max_samples=2)])
    trainer.setup(batch)

    # first-step loss as the convergence baseline
    first_metrics = {}
    orig_step = trainer._step_fn

    def capture_first(state, sharded, rng):
        state, metrics = orig_step(state, sharded, rng)
        if not first_metrics:
            first_metrics.update({k: float(v) for k, v in metrics.items()})
        return state, metrics

    trainer._step_fn = capture_first
    state = trainer.fit(lambda epoch: iter([batch]), num_epochs=80,
                        val_batches=lambda epoch: iter([batch]),
                        checkpoint_every_epochs=80, validate_every_epochs=40)
    assert int(state.step) == 80
    # one compiled program serves every step: an uncommitted initial state
    # would give step 1 its own signature and recompile at step 2 (~95 s on
    # the full-size model; see train.replicate_state)
    assert orig_step._cache_size() == 1, orig_step._cache_size()

    # --- converged: overfit the fixed batch decisively
    val = trainer.last_val_metrics
    assert val, "validation never ran"
    assert val["loss"] < 0.7 * first_metrics["loss"], (val["loss"], first_metrics["loss"])
    assert val["trajectory_loss"] < 0.5 * first_metrics["trajectory_loss"], (
        val["trajectory_loss"], first_metrics["trajectory_loss"])
    # open-loop metrics from the jitted test-path validation
    assert val["ade"] < 1.5, val["ade"]
    assert val["fde"] < 2.0, val["fde"]
    # EMA weights were validated too (lagging but in the same regime)
    assert "ema_loss" in val and np.isfinite(val["ema_loss"])

    # --- persistent per-step metrics sink: one JSONL row per train step with
    # every loss component, plus one per validation pass
    # (tensorboard-`log_dict` parity, `agent_lightning_module.py:35`)
    import json

    metrics_rows = [json.loads(line)
                    for line in (tmp_path / "ckpt" / "metrics.jsonl").read_text().splitlines()]
    train_rows = [r for r in metrics_rows if r["split"] == "train"]
    val_rows = [r for r in metrics_rows if r["split"] == "val"]
    assert len(train_rows) == 80 and len(val_rows) == 2
    for key in ("loss", "trajectory_loss", "agent_class_loss", "agent_box_loss",
                "bev_semantic_loss"):
        assert key in train_rows[0], train_rows[0]
    assert "ade" in val_rows[0] and "ema_loss" in val_rows[0]
    assert train_rows[-1]["loss"] < train_rows[0]["loss"]

    # --- BEV visualization callback wrote GT-vs-pred tiles at each validation
    viz_files = sorted((tmp_path / "viz").rglob("*.png"))
    assert any("bev_semantic" in f.name for f in viz_files), viz_files
    assert any("epoch_0039" in str(f) for f in viz_files), viz_files

    # --- checkpoint contains EMA; restore resumes exactly
    # (output_dir also holds metrics.jsonl — checkpoints are the directories)
    ckpts = sorted(p for p in (tmp_path / "ckpt").iterdir() if p.is_dir())
    assert len(ckpts) == 1

    trainer2 = Trainer(model, config, opt, mesh=mesh)
    trainer2.setup(batch)
    trainer2.restore_checkpoint(str(ckpts[0]))
    assert int(trainer2.state.step) == 80
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    p2 = np.asarray(jax.tree_util.tree_leaves(trainer2.state.params)[0])
    np.testing.assert_allclose(p1, p2)
    e1 = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    e2 = np.asarray(jax.tree_util.tree_leaves(trainer2.state.ema_params)[0])
    np.testing.assert_allclose(e1, e2)
    assert not np.allclose(p2, e2)  # EMA genuinely lags the raw params

    # --- resumed training continues from the restored optimizer state
    state2 = trainer2.fit(lambda epoch: iter([batch]), num_epochs=1)
    assert int(state2.step) == 81
    resumed_val = trainer2._validate(iter([batch]), epoch=0)
    assert resumed_val["loss"] < 0.75 * first_metrics["loss"]

    # --- eval-with-EMA: the agent loads EMA weights from the Trainer ckpt
    agent = DiffusionDriveAgent(config=config, checkpoint_path=str(ckpts[0]),
                                trajectory_head_type="mlp", use_ema=True, dtype=jnp.float32)
    agent.initialize()
    got = np.asarray(jax.tree_util.tree_leaves(agent.variables["params"])[0])
    np.testing.assert_allclose(e1, got)
    agent_raw = DiffusionDriveAgent(config=config, checkpoint_path=str(ckpts[0]),
                                    trajectory_head_type="mlp", dtype=jnp.float32)
    agent_raw.initialize()
    raw = np.asarray(jax.tree_util.tree_leaves(agent_raw.variables["params"])[0])
    np.testing.assert_allclose(p1, raw)
