"""Unit tests for the compact (pose, extent) TrackArrays representation."""

import numpy as np
import pytest

from diffusiondrive_tpu.common.dataclasses import TrajectorySampling
from diffusiondrive_tpu.evaluate.observation import TrackArrays, constant_velocity_forecast
from diffusiondrive_tpu.evaluate.state_array import box_to_corners


def make(poses, extents, is_red=None, override=None):
    L, O, _ = poses.shape
    return TrackArrays(
        poses=poses.astype(np.float32),
        extents=extents.astype(np.float32),
        valid=np.ones(O, bool),
        headings=poses[0, :, 2].astype(np.float32),
        is_agent=np.ones(O, bool),
        is_red_light=np.zeros(O, bool) if is_red is None else is_red,
        is_stopped=np.zeros(O, bool),
        previously_collided=np.zeros(O, bool),
        global_to_local=np.arange(L, dtype=np.int32),
        rings_override=override,
    )


def test_polygons_property_matches_box_corners():
    rng = np.random.default_rng(0)
    L, O = 3, 5
    poses = rng.normal(0, 20, (L, O, 3))
    extents = rng.uniform(1, 5, (O, 2))
    t = make(poses, extents)

    polys = t.polygons
    assert polys.shape == (L, O, 4, 2)
    expect = box_to_corners(poses[..., 0], poses[..., 1], poses[..., 2],
                            extents[None, :, 0], extents[None, :, 1])
    np.testing.assert_allclose(polys, expect.astype(np.float32), atol=1e-4)
    assert t.polygons is polys  # cached
    np.testing.assert_allclose(t.centers, poses[..., :2].astype(np.float32))


def test_red_light_override_rings_win_on_host():
    L, O, V = 2, 3, 16
    poses = np.zeros((L, O, 3))
    poses[..., 0] = [5.0, 10.0, 15.0]
    extents = np.full((O, 2), 2.0)
    is_red = np.array([False, True, False])
    override = np.full((L, O, V, 2), 1e6, np.float32)
    # an L-shaped lane-connector ring for the red-light slot
    ring = np.array([[8, -1], [12, -1], [12, 1], [10, 1], [10, 3], [8, 3]], np.float32)
    override[:, 1, :6] = ring
    override[:, 1, 6:] = ring[-1]

    t = make(poses, extents, is_red=is_red, override=override)
    polys = t.polygons
    assert polys.shape == (L, O, V, 2)
    np.testing.assert_array_equal(polys[:, 1], override[:, 1])  # exact ring kept
    # box slots expanded + padded with the last corner
    np.testing.assert_allclose(polys[0, 0, :4],
                               box_to_corners(5.0, 0.0, 0.0, 2.0, 2.0), atol=1e-4)
    np.testing.assert_allclose(polys[0, 0, 4:], np.tile(polys[0, 0, 3], (V - 4, 1)))


def test_constant_velocity_forecast_compact():
    boxes = np.array([[0.0, 0.0, 0.5, 4.0, 2.0], [10.0, 5.0, -0.2, 3.0, 1.5]])
    vel = np.array([[2.0, 0.0], [0.0, 0.0]])
    is_dyn = np.array([True, True])
    valid = np.array([True, False])
    poses, g2l = constant_velocity_forecast(
        boxes, vel, is_dyn, valid,
        TrajectorySampling(num_poses=40, interval_length=0.1),
        observation_samples=50, sample_res=2,
    )
    assert poses.shape == (26, 2, 3)
    assert g2l.shape == (52,)
    # dynamic valid track translates at v*t with heading fixed
    np.testing.assert_allclose(poses[:, 0, 0], 2.0 * np.arange(26) * 0.2, atol=1e-5)
    np.testing.assert_allclose(poses[:, 0, 2], 0.5)
    # invalid slot parked far away
    assert (poses[:, 1, :2] == 1e6).all()


def test_old_cache_format_raises_clear_error(tmp_path):
    from diffusiondrive_tpu.evaluate.metric_cache import MetricCache

    p = tmp_path / "old.npz"
    np.savez_compressed(p, tracks_polygons=np.zeros((1, 1, 8, 2), np.float32))
    with pytest.raises(ValueError, match="older cache format"):
        MetricCache.load(p)
