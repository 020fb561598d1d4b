"""End-to-end data layer tests on a synthetic OpenScene-style log."""

import numpy as np
import pytest

from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.common.geometry import yaw_to_quaternion

def test_scene_loader_and_agent_input(synthetic_log):
    logs_dir, blobs_dir = synthetic_log
    scene_filter = SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=1)
    loader = SceneLoader(logs_dir, blobs_dir, scene_filter, SensorConfig.build_no_sensors(),
                         build_map_api=False)
    assert len(loader) == 2  # 15 frames, windows of 14 at interval 1 with full length
    token = loader.tokens[0]
    assert token == "token_003"  # current frame = history idx 3

    agent_input = loader.get_agent_input_from_token(token)
    assert len(agent_input.ego_statuses) == 4
    # ego drives +x at 4 m/s: local history poses at -3..0 * 2 m
    np.testing.assert_allclose(agent_input.ego_statuses[0].ego_pose[0], -6.0, atol=1e-6)
    np.testing.assert_allclose(agent_input.ego_statuses[-1].ego_pose, 0.0, atol=1e-6)

    scene = loader.get_scene_from_token(token)
    future = scene.get_future_trajectory()
    assert future.poses.shape == (10, 3)
    np.testing.assert_allclose(future.poses[:, 0], 2.0 * np.arange(1, 11), atol=1e-6)
    np.testing.assert_allclose(future.poses[:, 1:], 0.0, atol=1e-6)

    per_log = loader.get_tokens_list_per_log()
    assert per_log == {"log_a": loader.tokens}


def test_transfuser_feature_builder(synthetic_log):
    from diffusiondrive_tpu.agents.diffusiondrive.features import (
        TransfuserFeatureBuilder,
        TransfuserTargetBuilder,
    )
    from diffusiondrive_tpu.models.config import TransfuserConfig

    logs_dir, blobs_dir = synthetic_log
    scene_filter = SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=14)
    loader = SceneLoader(
        logs_dir, blobs_dir, scene_filter, SensorConfig.build_all_sensors(include=[3]),
        build_map_api=False,
    )
    token = loader.tokens[0]
    agent_input = loader.get_agent_input_from_token(token)
    assert agent_input.cameras[3].cam_f0.image is not None
    assert agent_input.cameras[0].cam_f0.image is None  # only history idx 3 loaded
    assert agent_input.lidars[3].lidar_pc.shape[0] == 6

    config = TransfuserConfig()
    features = TransfuserFeatureBuilder(config).compute_features(agent_input)
    assert features["camera_feature"].shape == (256, 1024, 3)
    # uint8 end-to-end: the model normalizes to [0, 1] in-graph, so the H2D
    # copy and feature cache move 1 byte/px instead of a float32
    assert features["camera_feature"].dtype == np.uint8
    assert features["lidar_feature"].shape == (256, 256, 1)
    assert features["lidar_feature"].max() <= 1.0 and features["lidar_feature"].sum() > 0
    assert features["status_feature"].shape == (8,)
    np.testing.assert_allclose(features["status_feature"], [0, 1, 0, 0, 4, 0, 0, 0])

    scene = loader.get_scene_from_token(token)
    targets = TransfuserTargetBuilder(config).compute_targets(scene)
    assert targets["trajectory"].shape == (8, 3)
    assert targets["agent_states"].shape == (30, 5)
    assert targets["agent_labels"].sum() == 1  # one vehicle in range
    np.testing.assert_allclose(targets["agent_states"][0, :2], [10.0, 2.0], atol=1e-5)
    assert targets["bev_semantic_map"].shape == (128, 256)
    assert (targets["bev_semantic_map"] == 5).any()  # vehicle stamped


def test_dataset_cache_roundtrip(synthetic_log, tmp_path):
    from diffusiondrive_tpu.agents.ego_status_mlp_agent import (
        EgoStatusFeatureBuilder,
        TrajectoryTargetBuilder,
    )
    from diffusiondrive_tpu.common.dataclasses import TrajectorySampling
    from diffusiondrive_tpu.training.dataset import CacheOnlyDataset, Dataset, batch_iterator

    logs_dir, blobs_dir = synthetic_log
    scene_filter = SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=1)
    loader = SceneLoader(logs_dir, blobs_dir, scene_filter, SensorConfig.build_no_sensors(),
                         build_map_api=False)
    fb = [EgoStatusFeatureBuilder()]
    tb = [TrajectoryTargetBuilder(TrajectorySampling(time_horizon=4, interval_length=0.5))]

    cache = tmp_path / "cache"
    dataset = Dataset(loader, fb, tb, cache_path=str(cache))
    feats, tgts = dataset[0]
    assert feats["ego_status"].shape == (8,)
    assert tgts["trajectory"].shape == (8, 3)

    cache_only = CacheOnlyDataset(str(cache), fb, tb)
    assert len(cache_only) == len(dataset)
    f2, t2 = cache_only[0]
    np.testing.assert_allclose(sorted(f2["ego_status"]), sorted(feats["ego_status"]))

    batches = list(batch_iterator(cache_only, batch_size=2, shuffle=False))
    assert batches[0]["ego_status"].shape == (2, 8)
    assert batches[0]["trajectory"].shape == (2, 8, 3)


def test_baseline_agents(synthetic_log):
    from diffusiondrive_tpu.agents.constant_velocity_agent import ConstantVelocityAgent
    from diffusiondrive_tpu.agents.ego_status_mlp_agent import EgoStatusMLPAgent
    from diffusiondrive_tpu.agents.human_agent import HumanAgent

    logs_dir, blobs_dir = synthetic_log
    scene_filter = SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=14)
    loader = SceneLoader(logs_dir, blobs_dir, scene_filter, SensorConfig.build_no_sensors(),
                         build_map_api=False)
    token = loader.tokens[0]
    agent_input = loader.get_agent_input_from_token(token)
    scene = loader.get_scene_from_token(token)

    cv_traj = ConstantVelocityAgent().compute_trajectory(agent_input)
    np.testing.assert_allclose(cv_traj.poses[:, 0], 4.0 * 0.5 * np.arange(1, 9), atol=1e-5)

    human_traj = HumanAgent().compute_trajectory(agent_input, scene)
    np.testing.assert_allclose(human_traj.poses[:, 0], 2.0 * np.arange(1, 9), atol=1e-6)

    mlp = EgoStatusMLPAgent(hidden_layer_dim=32)
    mlp.initialize()
    mlp_traj = mlp.compute_trajectory(agent_input)
    assert mlp_traj.poses.shape == (8, 3)
