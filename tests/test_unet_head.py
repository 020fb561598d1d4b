"""Vanilla diffusion-policy trajectory head (ConditionalUnet1D, 20-step DDIM).

The reference keeps `modules/conditional_unet1d.py` as the legacy vanilla-DP
denoiser ablated against the truncated 2-step head (`README.md:36`). These
tests cover the head in isolation, the full-model "unet" wiring (train + test
paths, loss/grad flow), and the registry entry.
"""

import numpy as np
import jax
import jax.numpy as jnp

from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.models.diffusion_head import UnetTrajectoryHead
from diffusiondrive_tpu.ops.ddim import DDIMScheduler


def small_cfg(**kw):
    kw.setdefault("unet_down_dims", (32, 64))
    kw.setdefault("unet_test_steps", 4)
    return TransfuserConfig(**kw)


def make_inputs(B=2, d=256, seed=0):
    rng = np.random.default_rng(seed)
    ego = jnp.asarray(rng.normal(size=(B, 1, d)).astype(np.float32))
    status = jnp.asarray(rng.normal(size=(B, 1, d)).astype(np.float32))
    return ego, status


def test_rollout_timesteps_leading_spacing():
    sched = DDIMScheduler()
    ts = sched.rollout_timesteps(20)
    assert len(ts) == 20
    assert ts[0] == 950 and ts[-1] == 0
    assert all(a - b == 50 for a, b in zip(ts, ts[1:]))  # strictly descending by ratio


def test_unet_head_test_path_deterministic_given_noise():
    cfg = small_cfg()
    head = UnetTrajectoryHead(cfg)
    ego, status = make_inputs()
    noise = jnp.asarray(np.random.default_rng(3).normal(size=(2, cfg.num_poses, 3)).astype(np.float32))
    variables = jax.jit(lambda e, s: head.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(0)}, e, s, noise=noise
    ))(ego, status)

    apply = jax.jit(lambda v, e, s, n: head.apply(v, e, s, noise=n))
    out1 = apply(variables, ego, status, noise)
    out2 = apply(variables, ego, status, noise)
    traj = np.asarray(out1["trajectory"])
    assert traj.shape == (2, cfg.num_poses, 3)
    np.testing.assert_array_equal(traj, np.asarray(out2["trajectory"]))
    assert np.isfinite(traj).all()
    # outputs stay inside the denormalized diffusion box
    assert traj[..., 0].min() >= -1.2 - 1e-4 and traj[..., 0].max() <= 55.7 + 1e-4
    assert traj[..., 2].min() >= -2.0 - 1e-4 and traj[..., 2].max() <= 1.9 + 1e-4


def test_unet_head_conditioning_matters():
    cfg = small_cfg()
    head = UnetTrajectoryHead(cfg)
    ego, status = make_inputs()
    ego2, status2 = make_inputs(seed=9)
    noise = jnp.asarray(np.random.default_rng(3).normal(size=(2, cfg.num_poses, 3)).astype(np.float32))
    variables = head.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(0)}, ego, status, noise=noise
    )
    apply = jax.jit(lambda v, e, s: head.apply(v, e, s, noise=noise))
    a = np.asarray(apply(variables, ego, status)["trajectory"])
    b = np.asarray(apply(variables, ego2, status2)["trajectory"])
    assert np.abs(a - b).max() > 1e-5  # the FiLM conditioning is live


def test_unet_model_train_and_grads():
    """Full-model 'unet' wiring: train path produces a single-mode trajectory
    whose L1 loss backpropagates into the UNet parameters."""
    from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
    from diffusiondrive_tpu.training.losses import transfuser_loss

    cfg = small_cfg(
        image_architecture="resnet18", lidar_architecture="resnet18",
        camera_height=64, camera_width=256, lidar_resolution_height=64,
        lidar_resolution_width=64, img_vert_anchors=2, img_horz_anchors=8,
        lidar_vert_anchors=2, lidar_horz_anchors=2,
        bev_pixel_height=32, bev_pixel_width=64,
    )
    model = DiffusionDriveModel(cfg, trajectory_head_type="unet")
    rng = np.random.default_rng(0)
    B = 2
    batch = {
        "camera_feature": jnp.asarray(rng.uniform(size=(B, 64, 256, 3)).astype(np.float32)),
        "lidar_feature": jnp.asarray(rng.uniform(size=(B, 64, 64, 1)).astype(np.float32)),
        "status_feature": jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32)),
    }
    targets = {
        "trajectory": jnp.asarray(rng.normal(scale=5.0, size=(B, cfg.num_poses, 3)).astype(np.float32)),
        "agent_states": jnp.asarray(rng.normal(scale=10.0, size=(B, 30, 5)).astype(np.float32)),
        "agent_labels": jnp.asarray((rng.uniform(size=(B, 30)) > 0.7).astype(np.float32)),
        "bev_semantic_map": jnp.asarray(rng.integers(0, 7, size=(B, 32, 64)).astype(np.int32)),
    }

    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch["camera_feature"], batch["lidar_feature"], batch["status_feature"],
        targets=targets, train=True,
    )

    def loss_fn(params):
        out, _ = model.apply(
            {**variables, "params": params},
            batch["camera_feature"], batch["lidar_feature"], batch["status_feature"],
            targets=targets, train=True,
            rngs={"diffusion": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        assert "poses_reg_layers" not in out  # single-mode fallback loss path
        return transfuser_loss(targets, out, cfg)["loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    unet_grads = grads["trajectory_head"]["unet"]
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(unet_grads)))
    )
    assert gnorm > 0.0  # gradient reaches the denoiser


def test_registry_diffusion_policy_agent():
    from diffusiondrive_tpu.config.registry import build_agent

    agent = build_agent(
        "diffusion_policy_agent",
        config={"unet_down_dims": (32, 64), "unet_test_steps": 4},
    )
    assert agent.model.trajectory_head_type == "unet"
    assert agent.model.config.unet_test_steps == 4
