"""Training runtime tests: scheduler, optimizer groups, sharded train steps."""

import numpy as np
import jax
import pytest

from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
from diffusiondrive_tpu.parallel.mesh import create_mesh, shard_batch
from diffusiondrive_tpu.training.scheduler import warmup_cos_lr
from diffusiondrive_tpu.training.train import (
    OptimizerConfig,
    _param_labels,
    create_train_state,
    make_train_step,
    replicate_state,
    shard_train_step,
)

CAM_H, CAM_W, LID = 64, 256, 64


def tiny_config():
    return TransfuserConfig(
        image_architecture="resnet18",
        lidar_architecture="resnet18",
        camera_height=CAM_H, camera_width=CAM_W,
        lidar_resolution_height=LID, lidar_resolution_width=LID,
        img_vert_anchors=2, img_horz_anchors=8,
        lidar_vert_anchors=2, lidar_horz_anchors=2,
        bev_pixel_height=LID // 2, bev_pixel_width=LID,
    )


def make_batch(batch_size: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    return {
        "camera_feature": rng.uniform(size=(batch_size, CAM_H, CAM_W, 3)).astype(np.float32),
        "lidar_feature": rng.uniform(size=(batch_size, LID, LID, 1)).astype(np.float32),
        "status_feature": rng.normal(size=(batch_size, 8)).astype(np.float32),
        "trajectory": rng.normal(scale=5.0, size=(batch_size, 8, 3)).astype(np.float32),
        "agent_states": rng.normal(scale=10.0, size=(batch_size, 30, 5)).astype(np.float32),
        "agent_labels": (rng.uniform(size=(batch_size, 30)) > 0.7).astype(np.float32),
        "bev_semantic_map": rng.integers(0, 7, size=(batch_size, LID // 2, LID)).astype(np.int32),
    }


def test_warmup_cos_schedule():
    sched = warmup_cos_lr(lr=6e-4, min_lr=1e-6, epochs=100, warmup_epochs=3, steps_per_epoch=1)
    assert float(sched(0)) == pytest.approx(6e-4 / 3)
    assert float(sched(2)) == pytest.approx(6e-4)
    assert float(sched(3)) == pytest.approx(6e-4, rel=1e-3)
    # the cosine never quite reaches min_lr within `epochs` (reference parity)
    assert float(sched(99)) == pytest.approx(1e-6, rel=0.2)
    # monotone decreasing after warmup
    vals = [float(sched(s)) for s in range(3, 100, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_param_labels_single_lr_group():
    params = {
        "backbone": {"image_encoder_stem": {"conv1": {"kernel": np.zeros(1)}},
                     "lidar_encoder_stem": {"conv1": {"kernel": np.zeros(1)}}},
        "agent_head": {"states_fc1": {"kernel": np.zeros(1)}},
    }
    labels = _param_labels(params)
    assert labels["backbone"]["image_encoder_stem"]["conv1"]["kernel"] == "image_encoder"
    assert labels["backbone"]["lidar_encoder_stem"]["conv1"]["kernel"] == "default"
    assert labels["agent_head"]["states_fc1"]["kernel"] == "default"


def test_sharded_train_step_two_steps():
    """Two sharded steps on an 8-device mesh: loss finite and state updates."""
    config = tiny_config()
    model = DiffusionDriveModel(config)
    mesh = create_mesh()
    batch = make_batch(16)

    with mesh:
        state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, OptimizerConfig())
        step = shard_train_step(make_train_step(model, config, tx), mesh)
        sharded = shard_batch(batch, mesh)
        state1, metrics1 = step(state, sharded, jax.random.PRNGKey(1))
        loss1 = float(metrics1["loss"])
        # state is donated into the next step; snapshot params first
        p_before = np.asarray(jax.tree_util.tree_leaves(state1.params)[0])
        state2, metrics2 = step(state1, sharded, jax.random.PRNGKey(1))
        loss2 = float(metrics2["loss"])

    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert int(state2.step) == 2
    # params actually changed
    p_after = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    assert not np.allclose(p_before, p_after)
    for key in ("trajectory_loss", "agent_class_loss", "agent_box_loss", "bev_semantic_loss"):
        assert np.isfinite(float(metrics2[key]))


def test_train_step_mesh_equivalence():
    """One sharded train step on the 8-device mesh == the 1-device step.

    Same params, same batch, same rng: loss components, new batch stats and
    updated params must match across meshes. This pins the DDP gradient-sync
    semantics (reference `agent_lightning_module.py:35`) and the hand-written
    `custom_partitioning` batch rules the loss path crosses
    (`ops/batch_partition.py` under the Pallas Hungarian inside
    `transfuser_loss`): every real partition bug — a dropped shard, a wrong
    axis, a missing or doubled gradient all-reduce — shifts the loss and/or
    every gradient by O(1) relative and fails the bounds below by orders of
    magnitude.

    Tolerances are two-tier because the loss has DISCRETE selectors
    (Hungarian assignment, nearest-anchor argmin) fed by near-tied costs:
    at any near-init state the per-query predictions are strongly correlated,
    so the ~1e-6-rel fp-reorder noise of the 8-way BN/global reductions can
    flip an assignment. Measured on this exact setup (two seeds): only
    `agent_box_loss` moves (3e-4..1.1e-3 rel — the flipped pair's L1 terms),
    every other component stays at <=3e-6 rel, and with plain SGD the
    flip+reorder gradient noise bounds the param diff at lr * 1.2. The test
    uses SGD (not AdamW) deliberately: Adam's step-0 update g/(|g|+eps) is
    scale-free, so even 1e-9 gradient noise near zero-crossings becomes a
    full-lr param diff — with SGD the param bound stays interpretable as
    lr * ||grad diff||_inf. Perturbing params (scale 0.05) decorrelates the
    queries enough to keep losses in a sane regime (scale 0.2 measured
    chaotic: loss 1e5, class-cost flips everywhere).
    """
    import optax

    config = tiny_config()
    model = DiffusionDriveModel(config)
    batch = make_batch(16, seed=3)
    rng = jax.random.PRNGKey(1)
    lr = 1e-3
    tx = optax.sgd(lr)

    def perturb(params, key, scale=0.05):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(key, len(leaves))
        out = [p + scale * jax.random.normal(k, p.shape, p.dtype)
               for p, k in zip(leaves, keys)]
        return jax.tree_util.tree_unflatten(treedef, out)

    results = {}
    for name, devs in (("dev1", jax.devices()[:1]), ("dev8", jax.devices()[:8])):
        mesh = create_mesh(devs)
        with mesh:
            state, _ = create_train_state(model, jax.random.PRNGKey(0), batch, OptimizerConfig())
            state = state.replace(
                params=perturb(state.params, jax.random.PRNGKey(42)),
                opt_state=tx.init(state.params), ema_params=None)
            state = replicate_state(state, mesh)
            step = shard_train_step(make_train_step(model, config, tx), mesh)
            new_state, metrics = step(state, shard_batch(batch, mesh), rng)
            results[name] = (
                jax.tree_util.tree_map(np.asarray, new_state.params),
                jax.tree_util.tree_map(np.asarray, new_state.batch_stats),
                {k: float(v) for k, v in metrics.items()},
            )

    params1, stats1, metrics1 = results["dev1"]
    params8, stats8, metrics8 = results["dev8"]

    # Batch stats have no discrete path: pure fp-reorder tolerance
    # (measured max abs diff 4e-5 on running vars of order 1).
    for (path, s1), s8 in zip(jax.tree_util.tree_flatten_with_path(stats1)[0],
                              jax.tree_util.tree_leaves(stats8)):
        np.testing.assert_allclose(
            s8, s1, rtol=1e-3, atol=1e-4,
            err_msg=f"batch stats diverged across meshes: {jax.tree_util.keystr(path)}")

    assert set(metrics1) == set(metrics8)
    for key in sorted(metrics1):
        # agent_box_loss owns the Hungarian tie-flip channel (measured
        # <=1.1e-3 rel) and the total "loss" inherits it weighted (measured
        # 6.5e-5 rel); everything else measured <=3e-6 rel.
        rel = {"agent_box_loss": 1e-2, "loss": 1e-3}.get(key, 1e-4)
        assert metrics8[key] == pytest.approx(metrics1[key], rel=rel, abs=1e-6), (
            f"loss component {key!r}: dev8={metrics8[key]} dev1={metrics1[key]}"
        )

    flat1 = jax.tree_util.tree_flatten_with_path(params1)[0]
    flat8 = jax.tree_util.tree_leaves(params8)
    assert len(flat1) == len(flat8)
    # SGD update = lr * grad: measured ||p8-p1||_inf = 1.1e-3 = lr * 1.2
    # (flip channel); a missing/doubled all-reduce rescales every gradient
    # (magnitudes up to ~1e3 here) and blows through this by >=10x.
    for (path, p1), p8 in zip(flat1, flat8):
        diff = np.abs(np.asarray(p8, np.float64) - np.asarray(p1, np.float64))
        assert diff.max() < 5.0 * lr, (
            f"param diverged beyond the tie-flip gradient bound across meshes: "
            f"{jax.tree_util.keystr(path)} max|d|={diff.max():.2e}")


def test_ema_params_never_alias_params():
    """Donation regression: `ema_params=params` puts the SAME buffer in the
    donated state twice and fails at runtime on TPU ("InvalidArgument",
    full-size model, batch>=8 — round-4 bisect). The EMA leaves must be
    distinct buffers."""
    import jax.numpy as jnp

    config = tiny_config()
    model = DiffusionDriveModel(config, dtype=jnp.float32)
    batch = make_batch(2)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), batch, OptimizerConfig(ema_decay=0.999))
    p_leaves = jax.tree_util.tree_leaves(state.params)
    e_leaves = jax.tree_util.tree_leaves(state.ema_params)
    assert len(p_leaves) == len(e_leaves)
    for p, e in zip(p_leaves, e_leaves):
        assert p is not e
        assert p.unsafe_buffer_pointer() != e.unsafe_buffer_pointer()
        np.testing.assert_array_equal(np.asarray(p), np.asarray(e))
