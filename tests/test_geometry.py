import numpy as np
import pytest

from diffusiondrive_tpu.common.geometry import (
    StateSE2,
    calculate_progress,
    convert_absolute_to_relative_se2_array,
    convert_relative_to_absolute_se2_array,
    normalize_angle,
    parallel_discrete_path,
    quaternion_to_yaw,
    translate_lon_and_lat,
    yaw_to_quaternion,
)


def test_normalize_angle_wraps():
    angles = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -3 * np.pi, 0.1, 2 * np.pi + 0.1])
    wrapped = normalize_angle(angles)
    assert np.all(wrapped <= np.pi + 1e-12)
    assert np.all(wrapped >= -np.pi - 1e-12)
    np.testing.assert_allclose(np.sin(wrapped), np.sin(angles), atol=1e-12)
    np.testing.assert_allclose(np.cos(wrapped), np.cos(angles), atol=1e-12)


def test_abs_rel_roundtrip():
    rng = np.random.default_rng(0)
    origin = StateSE2(1.5, -2.0, 0.7)
    states = rng.uniform(-10, 10, size=(20, 3))
    rel = convert_absolute_to_relative_se2_array(origin, states)
    back = convert_relative_to_absolute_se2_array(origin, rel)
    np.testing.assert_allclose(back[:, :2], states[:, :2], atol=1e-9)
    np.testing.assert_allclose(np.cos(back[:, 2]), np.cos(states[:, 2]), atol=1e-9)
    np.testing.assert_allclose(np.sin(back[:, 2]), np.sin(states[:, 2]), atol=1e-9)


def test_relative_of_origin_is_zero():
    origin = StateSE2(3.0, 4.0, 1.2)
    rel = convert_absolute_to_relative_se2_array(origin, np.array([[3.0, 4.0, 1.2]]))
    np.testing.assert_allclose(rel, np.zeros((1, 3)), atol=1e-12)


def test_relative_axes():
    # A point 1m ahead of an ego heading along +y must be at local (1, 0).
    origin = StateSE2(0.0, 0.0, np.pi / 2)
    rel = convert_absolute_to_relative_se2_array(origin, np.array([[0.0, 1.0, np.pi / 2]]))
    np.testing.assert_allclose(rel, [[1.0, 0.0, 0.0]], atol=1e-12)


def test_translate_lon_and_lat():
    centers = np.zeros((1, 2))
    headings = np.array([0.0])
    out = translate_lon_and_lat(centers, headings, lon=2.0, lat=1.0)
    np.testing.assert_allclose(out, [[2.0, 1.0]], atol=1e-12)


def test_progress_and_parallel_path():
    path = [StateSE2(float(i), 0.0, 0.0) for i in range(5)]
    progress = calculate_progress(path)
    np.testing.assert_allclose(progress, [0, 1, 2, 3, 4])
    offset_path = parallel_discrete_path(path, offset=2.0)
    for p, q in zip(path, offset_path):
        assert pytest.approx(q.y, abs=1e-12) == p.y + 2.0
        assert pytest.approx(q.x, abs=1e-12) == p.x


def test_quaternion_yaw_roundtrip():
    for yaw in np.linspace(-3.1, 3.1, 13):
        q = yaw_to_quaternion(yaw)
        assert pytest.approx(quaternion_to_yaw(q), abs=1e-12) == yaw
