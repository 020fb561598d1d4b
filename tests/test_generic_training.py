"""Generic agent training: the EgoStatusMLP learns the synthetic dataset."""

import numpy as np

from diffusiondrive_tpu.agents.ego_status_mlp_agent import (
    EgoStatusFeatureBuilder,
    EgoStatusMLPAgent,
    TrajectoryTargetBuilder,
)
from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig, TrajectorySampling
from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.training.dataset import Dataset
from diffusiondrive_tpu.training.generic import train_agent


def test_ego_mlp_learns_constant_velocity(synthetic_log, tmp_path):
    logs_dir, blobs_dir = synthetic_log
    loader = SceneLoader(
        logs_dir, blobs_dir,
        SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=1),
        SensorConfig.build_no_sensors(), build_map_api=False,
    )
    dataset = Dataset(
        loader,
        [EgoStatusFeatureBuilder()],
        [TrajectoryTargetBuilder(TrajectorySampling(time_horizon=4, interval_length=0.5))],
        cache_path=str(tmp_path / "cache"),
    )

    agent = EgoStatusMLPAgent(hidden_layer_dim=64, lr=1e-3)
    agent.initialize()
    before = agent.compute_trajectory(loader.get_agent_input_from_token(loader.tokens[0]))
    err_before = np.abs(before.poses[:, 0] - 2.0 * np.arange(1, 9)).mean()

    train_agent(agent, dataset, batch_size=2, num_epochs=300)

    after = agent.compute_trajectory(loader.get_agent_input_from_token(loader.tokens[0]))
    err_after = np.abs(after.poses[:, 0] - 2.0 * np.arange(1, 9)).mean()
    assert err_after < err_before
    assert err_after < 0.5, err_after  # learned the 4 m/s straight drive
