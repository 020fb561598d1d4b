"""Mesh-sharded batched evaluation on the virtual 8-device CPU mesh.

The TPU-native replacement for the reference's Ray eval fan-out
(`run_pdm_score.py:134-142`, SURVEY §2.10): the scene/batch dim of the
planner forward and the simulate+score programs shards over the mesh `data`
axis. These tests prove (a) sharded scoring is numerically identical to the
single-device program, including the pad-to-mesh-multiple path, and (b) the
full runner executes with a mesh, sharding the model forward too.
"""

import jax
import numpy as np
import pytest

from diffusiondrive_tpu.common.dataclasses import (
    SceneFilter,
    Trajectory,
    TrajectorySampling,
)
from diffusiondrive_tpu.common.dataloader import MetricCacheLoader, SceneLoader
from diffusiondrive_tpu.evaluate.metric_cache import MetricCache
from diffusiondrive_tpu.evaluate.pdm_score import batched_pdm_score
from diffusiondrive_tpu.evaluate.runner import run_pdm_score_evaluation
from diffusiondrive_tpu.evaluate.simulator import PDMSimulator
from diffusiondrive_tpu.parallel.mesh import create_mesh

from test_runner import build_caches


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should force 8 virtual CPU devices"
    return create_mesh(jax.devices()[:8])


def _straight_trajectory(speed: float = 4.0) -> Trajectory:
    t = np.arange(1, 9) * 0.5
    poses = np.stack([speed * t, np.zeros(8), np.zeros(8)], axis=1).astype(np.float32)
    return Trajectory(poses)


def _load_caches(cache_dir, tokens):
    loader = MetricCacheLoader(cache_dir)
    return [loader.get_from_token(t) for t in tokens]


def test_mesh_scoring_matches_single_device(tmp_path, mesh8):
    """Sharded simulate+score == single-device, with scene-count padding
    (5 scenes over 8 devices pads to 8; padded rows must be dropped)."""
    tokens = [f"tok_{i}" for i in range(5)]
    build_caches(tokens, tmp_path / "cache")
    caches = _load_caches(tmp_path / "cache", tokens)
    trajs = [_straight_trajectory() for _ in tokens]
    simulator = PDMSimulator(TrajectorySampling(num_poses=40, interval_length=0.1))

    ref = batched_pdm_score(caches, trajs, simulator)
    out = batched_pdm_score(caches, trajs, simulator, mesh=mesh8)
    assert len(out) == len(ref) == 5
    for a, b in zip(ref, out):
        for field in ("score", "no_at_fault_collisions", "ego_progress", "comfort",
                      "time_to_collision_within_bound", "drivable_area_compliance",
                      "driving_direction_compliance"):
            np.testing.assert_allclose(getattr(a, field), getattr(b, field),
                                       atol=1e-5, err_msg=field)


def test_runner_with_mesh(synthetic_log, tmp_path, mesh8):
    """Full eval runner on a mesh: sharded model forward (set_mesh) + sharded
    scoring; batch_size rounds up to a mesh multiple internally."""
    from diffusiondrive_tpu.config.registry import build_agent

    logs_dir, blobs_dir = synthetic_log
    scene_filter = SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=1)

    agent = build_agent("diffusiondrive_agent", config={
        "image_architecture": "resnet18", "lidar_architecture": "resnet18",
        "camera_height": 64, "camera_width": 256,
        "lidar_resolution_height": 64, "lidar_resolution_width": 64,
        "pixels_per_meter": 1.0,
        "img_vert_anchors": 2, "img_horz_anchors": 8,
        "lidar_vert_anchors": 2, "lidar_horz_anchors": 2,
        "bev_pixel_height": 32, "bev_pixel_width": 64,
    })
    loader = SceneLoader(logs_dir, blobs_dir, scene_filter,
                         sensor_config=agent.get_sensor_config(), build_map_api=False)
    build_caches(loader.tokens, tmp_path / "cache")

    tokens = loader.tokens[:2]
    loader.tokens[:] = tokens
    rows = run_pdm_score_evaluation(
        agent, loader, MetricCacheLoader(tmp_path / "cache"), batch_size=6, mesh=mesh8)
    rows = [r for r in rows if r["token"] in tokens]
    assert len(rows) == 2
    assert all(r["valid"] for r in rows), rows
    assert all(np.isfinite(r["score"]) for r in rows)
    # the forward really was sharded over the mesh
    assert agent._mesh is mesh8
