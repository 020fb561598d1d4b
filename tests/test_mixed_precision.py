"""bf16-mixed training parity vs fp32.

Parity target: the reference trains with `precision: 16-mixed`
(`config/training/default_training.yaml:43`) — half-precision compute with
fp32 master params. Here: model compute dtype bf16 (flax `dtype`), params /
optimizer state / loss accumulation fp32 (`transfuser_loss` upcasts on
entry). These tests pin that contract: same init, one train step in each
precision, losses agree within bf16 tolerance, and the bf16 step's params and
gradients stay fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
from diffusiondrive_tpu.training.train import (
    OptimizerConfig,
    create_train_state,
    make_train_step,
)

CAM_H, CAM_W, LID = 32, 128, 32


def tiny_config() -> TransfuserConfig:
    return TransfuserConfig(
        image_architecture="resnet18", lidar_architecture="resnet18",
        camera_height=CAM_H, camera_width=CAM_W,
        lidar_resolution_height=LID, lidar_resolution_width=LID,
        img_vert_anchors=1, img_horz_anchors=4,
        lidar_vert_anchors=1, lidar_horz_anchors=1,
        bev_pixel_height=LID // 2, bev_pixel_width=LID,
    )


def make_batch(batch_size: int = 2):
    rng = np.random.default_rng(0)
    return {
        "camera_feature": rng.normal(size=(batch_size, CAM_H, CAM_W, 3)).astype(np.float32),
        "lidar_feature": rng.normal(size=(batch_size, LID, LID, 1)).astype(np.float32),
        "status_feature": rng.normal(size=(batch_size, 8)).astype(np.float32),
        "trajectory": rng.normal(size=(batch_size, 8, 3)).astype(np.float32),
        "agent_states": rng.normal(size=(batch_size, 30, 5)).astype(np.float32),
        "agent_labels": (rng.uniform(size=(batch_size, 30)) > 0.5).astype(np.float32),
        "bev_semantic_map": rng.integers(0, 7, size=(batch_size, LID // 2, LID)).astype(np.int32),
    }


def _one_step(dtype):
    config = tiny_config()
    model = DiffusionDriveModel(config, dtype=dtype)
    batch = make_batch()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, OptimizerConfig())
    step = jax.jit(make_train_step(model, config, tx))
    new_state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                              jax.random.PRNGKey(1))
    return state, new_state, {k: float(v) for k, v in metrics.items()}


def test_bf16_mixed_training_parity():
    """One test for the whole contract (pays the two XLA backward compiles
    once — xdist would rebuild a module fixture per worker)."""
    s32, n32, m32 = _one_step(jnp.float32)
    s16, n16, m16 = _one_step(jnp.bfloat16)

    # --- identical fp32 initialization regardless of compute dtype
    leaves32 = jax.tree_util.tree_leaves(s32.params)
    leaves16 = jax.tree_util.tree_leaves(s16.params)
    assert len(leaves32) == len(leaves16)
    for a, b in zip(leaves32, leaves16):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # --- params/optimizer state stay fp32 after a bf16 step
    for leaf in jax.tree_util.tree_leaves(n16.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(n16.opt_state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    assert np.isfinite(m16["loss"])

    # --- loss parity: same batch/params/noise, only the compute dtype
    # differs. Continuous components must agree within bf16 rounding. The
    # detection losses go through the DISCRETE Hungarian assignment — at
    # random init the 30 predicted boxes have near-tied costs, so bf16
    # rounding legitimately flips matches (the reference's AMP training has
    # the same property); bound those loosely instead.
    for key in ("loss", "trajectory_loss", "bev_semantic_loss"):
        a, b = m32[key], m16[key]
        assert abs(a - b) <= 0.05 * max(abs(a), 1.0), (key, a, b)
    for key in ("agent_class_loss", "agent_box_loss"):
        a, b = m32[key], m16[key]
        assert np.isfinite(b) and abs(a - b) <= 0.30 * max(abs(a), 1.0), (key, a, b)

    # --- the bf16 step genuinely updates the fp32 params
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(s16.params),
                        jax.tree_util.tree_leaves(n16.params))
    ]
    assert max(diffs) > 0.0
