"""Device preprocessing vs host reference numerics."""

import numpy as np
import jax.numpy as jnp

from diffusiondrive_tpu.ops.lidar_splat import _bin_indices, histogram2d_jax, splat_points
from diffusiondrive_tpu.ops.preprocessing import lidar_bev, pad_point_cloud, stitch_cameras


def np_reference_splat(points, min_v=-32.0, max_v=32.0, bins=256, hist_max=5):
    """The reference splat (`transfuser_features.py:106-124`) verbatim math."""
    xbins = np.linspace(min_v, max_v, bins + 1)
    ybins = np.linspace(min_v, max_v, bins + 1)
    hist = np.histogramdd(points[:, :2], bins=(xbins, ybins))[0]
    hist[hist > hist_max] = hist_max
    return hist / hist_max


def test_histogram_matches_histogramdd():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-35, 35, size=(20000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.3, 3.0, 20000)  # all above split height
    # include exact edge values
    pts[0, :2] = (32.0, 32.0)
    pts[1, :2] = (-32.0, -32.0)

    ours = np.asarray(splat_points(jnp.asarray(pts), jnp.ones(len(pts), bool), use_pallas=False))[..., 0]
    ref = np_reference_splat(pts[(np.abs(pts[:, 0]) <= 35)])
    # fp boundary assignments may differ for a handful of points
    mismatched = np.abs(ours - ref) > 1e-6
    assert mismatched.mean() < 1e-3, mismatched.sum()


def test_z_filtering_and_padding():
    pts = np.array(
        [
            [0.0, 0.0, 1.0],    # counted
            [0.0, 0.0, 0.1],    # below split height -> dropped
            [0.0, 0.0, 150.0],  # above max height -> dropped
            [50.0, 0.0, 1.0],   # out of range -> dropped
        ],
        np.float32,
    )
    valid = np.array([True, True, True, True])
    out = np.asarray(splat_points(jnp.asarray(pts), jnp.asarray(valid), use_pallas=False))[..., 0]
    assert out.sum() * 5 == 1.0  # exactly one point landed

    padded, mask = pad_point_cloud(np.zeros((6, 10), np.float32), max_points=64)
    assert padded.shape == (64, 3) and mask.sum() == 10


def test_stitch_cameras_matches_host_builder():
    import cv2

    rng = np.random.default_rng(1)
    imgs = {k: rng.integers(0, 255, size=(1080, 1920, 3), dtype=np.uint8) for k in "lfr"}

    # host reference (cv2)
    l0 = imgs["l"][28:-28, 416:-416]
    f0 = imgs["f"][28:-28]
    r0 = imgs["r"][28:-28, 416:-416]
    stitched = np.concatenate([l0, f0, r0], axis=1)
    ref = cv2.resize(stitched, (1024, 256)).astype(np.float32) / 255.0

    ours = np.asarray(
        stitch_cameras(
            jnp.asarray(imgs["l"][None]), jnp.asarray(imgs["f"][None]), jnp.asarray(imgs["r"][None])
        )
    )[0]
    assert ours.shape == (256, 1024, 3)
    # cv2 INTER_LINEAR rounds to uint8 (fixed point); ours is float-exact,
    # so differences are bounded by the quantization step 1/255.
    assert np.abs(ours - ref).max() < 1.5 / 255.0
    assert np.abs(ours - ref).mean() < 0.5 / 255.0


def test_batched_lidar_bev():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-30, 30, size=(2, 5000, 3)).astype(np.float32)
    pts[..., 2] = 1.0
    valid = np.ones((2, 5000), bool)
    out = np.asarray(lidar_bev(jnp.asarray(pts), jnp.asarray(valid)))
    assert out.shape == (2, 256, 256, 1)
    assert out.max() <= 1.0 and out.sum() > 0


def test_lidar_bev_sharded_matches_unsharded():
    """shard_map'd splat over an 8-device mesh == single-program numerics."""
    import jax

    from diffusiondrive_tpu.parallel.mesh import create_mesh, shard_batch

    rng = np.random.default_rng(3)
    pts = rng.uniform(-30, 30, size=(8, 4096, 3)).astype(np.float32)
    pts[..., 2] = 1.0
    valid = rng.uniform(size=(8, 4096)) > 0.1
    want = np.asarray(lidar_bev(jnp.asarray(pts), jnp.asarray(valid)))

    mesh = create_mesh(jax.devices()[:8])
    sharded = shard_batch({"p": pts, "v": valid}, mesh)
    got = np.asarray(lidar_bev(sharded["p"], sharded["v"], mesh=mesh))
    np.testing.assert_array_equal(got, want)


def test_raw_builder_matches_host_builder(synthetic_log):
    """Device preprocessing path reproduces the host feature builder."""
    from diffusiondrive_tpu.agents.diffusiondrive.features import (
        RawSensorFeatureBuilder,
        TransfuserFeatureBuilder,
    )
    from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
    from diffusiondrive_tpu.common.dataloader import SceneLoader
    from diffusiondrive_tpu.models.config import TransfuserConfig

    logs_dir, blobs_dir = synthetic_log
    loader = SceneLoader(
        logs_dir, blobs_dir,
        SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=14),
        SensorConfig.build_all_sensors(include=[3]), build_map_api=False,
    )
    agent_input = loader.get_agent_input_from_token(loader.tokens[0])
    config = TransfuserConfig()

    host = TransfuserFeatureBuilder(config).compute_features(agent_input)
    raw = RawSensorFeatureBuilder(config, max_points=1024).compute_features(agent_input)

    camera_dev = np.asarray(
        stitch_cameras(
            jnp.asarray(raw["camera_l0"][None]),
            jnp.asarray(raw["camera_f0"][None]),
            jnp.asarray(raw["camera_r0"][None]),
        )
    )[0]
    assert np.abs(camera_dev - host["camera_feature"].astype(np.float32) / 255.0).max() < 1.5 / 255.0

    lidar_dev = np.asarray(
        lidar_bev(jnp.asarray(raw["lidar_points"][None]), jnp.asarray(raw["lidar_valid"][None]), config)
    )[0]
    np.testing.assert_allclose(lidar_dev, host["lidar_feature"], atol=1e-6)
    np.testing.assert_allclose(raw["status_feature"], host["status_feature"])
