"""End-to-end evaluation runner test: synthetic logs + caches -> score CSV."""

import numpy as np
import pandas as pd

from diffusiondrive_tpu.agents.constant_velocity_agent import ConstantVelocityAgent
from diffusiondrive_tpu.agents.human_agent import HumanAgent
from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
from diffusiondrive_tpu.common.dataloader import MetricCacheLoader, SceneLoader
from diffusiondrive_tpu.common.enums import StateIndex
from diffusiondrive_tpu.evaluate.metric_cache import MetricCache
from diffusiondrive_tpu.evaluate.runner import run_pdm_score_evaluation, write_score_csv

from test_scorer import centerline, make_drivable, make_tracks, straight_states


def build_caches(tokens, cache_dir, speed=4.0):
    for i, token in enumerate(tokens):
        # global frame: ego at x = 2*(i+3) driving +x at `speed`
        x0 = 2.0 * (i + 3)
        states = straight_states(speed).astype(np.float64)
        states[:, StateIndex.X] += x0
        cl = centerline()
        cache = MetricCache(
            token=token,
            log_name="log_a",
            pdm_poses=states[:, :3],
            pdm_times=np.arange(41) * 0.1,
            initial_state=states[0],
            tracks=make_tracks(),
            drivable=make_drivable(),
            centerline=cl,
            route_lane_ids=[],
        )
        cache.save(cache_dir / "log_a" / token / "metric_cache.npz")


def test_runner_cv_and_human(synthetic_log, tmp_path):
    logs_dir, blobs_dir = synthetic_log
    scene_filter = SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=1)
    loader = SceneLoader(logs_dir, blobs_dir, scene_filter, SensorConfig.build_no_sensors(),
                         build_map_api=False)

    cache_dir = tmp_path / "metric_cache"
    build_caches(loader.tokens, cache_dir)
    cache_loader = MetricCacheLoader(cache_dir)
    assert set(cache_loader.tokens) == set(loader.tokens)

    rows = run_pdm_score_evaluation(ConstantVelocityAgent(), loader, cache_loader, batch_size=8)
    assert len(rows) == len(loader.tokens)
    assert all(r["valid"] for r in rows)
    # ego drives straight on an empty straight road: near-perfect score
    for r in rows:
        assert r["score"] > 0.9, r

    out_csv = write_score_csv(rows, tmp_path / "out")
    df = pd.read_csv(out_csv)
    assert df.iloc[-1]["token"] == "average"
    assert df.iloc[-1]["score"] > 0.9

    # privileged human agent also runs through the same harness
    rows_h = run_pdm_score_evaluation(HumanAgent(), loader, cache_loader, batch_size=8)
    assert all(r["valid"] for r in rows_h)
    for r in rows_h:
        assert r["score"] > 0.9, r


def test_runner_batched_model_forward(synthetic_log, tmp_path):
    """Feature-builder agents go through the runner's stacked batched forward
    (`runner.py`: one compiled program per batch shape, partial batches padded
    by repeating the last item) — the path every DiffusionDrive-family agent
    uses in evaluation."""
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

    cache_dir = tmp_path / "metric_cache"
    build_caches(loader.tokens, cache_dir)

    # 2 tokens with batch_size 8 exercises the pad-partial-batch path
    tokens = loader.tokens[:2]
    loader.tokens[:] = tokens  # restrict the run
    rows = run_pdm_score_evaluation(agent, loader, MetricCacheLoader(cache_dir), batch_size=8)
    rows = [r for r in rows if r["token"] in tokens]
    assert len(rows) == 2
    assert all(r["valid"] for r in rows), rows
    assert all(np.isfinite(r["score"]) for r in rows)


def test_initialize_is_idempotent():
    """The runner calls `agent.initialize()` on every evaluation run; a
    re-initialize must not rebuild weights (each rebuild re-jits model.init —
    a fresh jit wrapper whose cache never hits, ~40 s XLA recompile per
    evaluation measured on v5e)."""
    from diffusiondrive_tpu.agents.ego_status_mlp_agent import EgoStatusMLPAgent

    agent = EgoStatusMLPAgent(lr=1e-3, hidden_layer_dim=16)
    agent.initialize()
    first = agent.variables
    agent.initialize()
    assert agent.variables is first
