"""Shape/compile smoke tests of the DiffusionDrive model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel


CAM_H, CAM_W, LID = 64, 256, 64


@pytest.fixture(scope="module")
def tiny_config():
    """Full architecture at 1/4 spatial extent so CPU tests stay fast:
    camera 64x256, lidar 64x64, fusion token grids 2x8 / 2x2."""
    return TransfuserConfig(
        camera_height=CAM_H,
        camera_width=CAM_W,
        lidar_resolution_height=LID,
        lidar_resolution_width=LID,
        img_vert_anchors=2,
        img_horz_anchors=8,
        lidar_vert_anchors=2,
        lidar_horz_anchors=2,
        bev_pixel_height=LID // 2,
        bev_pixel_width=LID,
    )


@pytest.fixture(scope="module")
def model_and_vars(tiny_config):
    model = DiffusionDriveModel(tiny_config)
    rng = jax.random.PRNGKey(0)
    camera = jnp.zeros((1, CAM_H, CAM_W, 3), jnp.float32)
    lidar = jnp.zeros((1, LID, LID, 1), jnp.float32)
    status = jnp.zeros((1, 8), jnp.float32)
    # jit the init: one XLA program instead of one compile per eager op
    variables = jax.jit(model.init)(
        {"params": rng, "diffusion": rng, "dropout": rng}, camera, lidar, status
    )
    return model, variables


def test_eval_forward_shapes(tiny_config, model_and_vars):
    model, variables = model_and_vars
    B = 2
    camera = jnp.ones((B, CAM_H, CAM_W, 3), jnp.float32) * 0.5
    lidar = jnp.zeros((B, LID, LID, 1), jnp.float32)
    status = jnp.ones((B, 8), jnp.float32)

    out = jax.jit(model.apply)(variables, camera, lidar, status, rngs={"diffusion": jax.random.PRNGKey(1)})

    assert out["trajectory"].shape == (B, 8, 3)
    assert out["poses_reg"].shape == (B, 20, 8, 3)
    assert out["poses_cls"].shape == (B, 20)
    assert out["agent_states"].shape == (B, 30, 5)
    assert out["agent_labels"].shape == (B, 30)
    assert out["bev_semantic_map"].shape == (B, LID // 2, LID, 7)

    # trajectory values live in the normalization ranges
    traj = np.asarray(out["trajectory"])
    assert np.all(np.abs(traj[..., 2]) <= np.pi + 1e-5)
    assert np.isfinite(traj).all()


def test_train_forward_has_layer_outputs(tiny_config, model_and_vars):
    model, variables = model_and_vars
    B = 2
    camera = jnp.ones((B, CAM_H, CAM_W, 3), jnp.float32) * 0.5
    lidar = jnp.zeros((B, LID, LID, 1), jnp.float32)
    status = jnp.ones((B, 8), jnp.float32)
    targets = {"trajectory": jnp.zeros((B, 8, 3), jnp.float32)}

    apply_train = jax.jit(
        lambda v, c, l, s, t, r: model.apply(
            v, c, l, s, targets=t, train=True, rngs=r, mutable=["batch_stats"]
        )
    )
    out, mutated = apply_train(
        variables, camera, lidar, status, targets,
        {"diffusion": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
    )
    assert out["poses_reg_layers"].shape == (tiny_config.diff_decoder_layers, B, 20, 8, 3)
    assert out["poses_cls_layers"].shape == (tiny_config.diff_decoder_layers, B, 20)
    assert out["plan_anchor"].shape == (B, 20, 8, 2)
    assert "batch_stats" in mutated
