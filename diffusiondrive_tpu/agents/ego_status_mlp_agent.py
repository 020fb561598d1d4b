"""EgoStatusMLP agent: a 4-layer MLP on (velocity, accel, driving command).

Parity: `navsim/agents/ego_status_mlp_agent.py` — sensor-free baseline used as
a scoring sanity anchor and the smallest trainable agent.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusiondrive_tpu.agents.abstract_agent import AbstractAgent
from diffusiondrive_tpu.common.dataclasses import AgentInput, Scene, SensorConfig, TrajectorySampling
from diffusiondrive_tpu.training.abstract_feature_target_builder import (
    AbstractFeatureBuilder,
    AbstractTargetBuilder,
)


class EgoStatusFeatureBuilder(AbstractFeatureBuilder):
    """(velocity[2], acceleration[2], driving_command[4]) -> (8,) feature."""

    def get_unique_name(self) -> str:
        return "ego_status_feature"

    def compute_features(self, agent_input: AgentInput) -> Dict[str, np.ndarray]:
        status = agent_input.ego_statuses[-1]
        feature = np.concatenate(
            [
                np.asarray(status.ego_velocity, np.float32),
                np.asarray(status.ego_acceleration, np.float32),
                np.asarray(status.driving_command, np.float32),
            ]
        )
        return {"ego_status": feature}


class TrajectoryTargetBuilder(AbstractTargetBuilder):
    """GT future trajectory target."""

    def __init__(self, trajectory_sampling: TrajectorySampling):
        self._trajectory_sampling = trajectory_sampling

    def get_unique_name(self) -> str:
        return "trajectory_target"

    def compute_targets(self, scene: Scene) -> Dict[str, np.ndarray]:
        future = scene.get_future_trajectory(self._trajectory_sampling.num_poses)
        return {"trajectory": np.asarray(future.poses, np.float32)}


class _EgoStatusMLP(nn.Module):
    hidden_dim: int
    num_poses: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(3):
            x = nn.Dense(self.hidden_dim, name=f"fc{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.num_poses * 3, name="out")(x)
        return x.reshape(x.shape[0], self.num_poses, 3)


class EgoStatusMLPAgent(AbstractAgent):
    """Sensor-free MLP planner."""

    requires_scene = False

    def __init__(
        self,
        trajectory_sampling: TrajectorySampling = None,
        hidden_layer_dim: int = 512,
        lr: float = 1e-4,
        checkpoint_path: Optional[str] = None,
    ):
        self._trajectory_sampling = trajectory_sampling or TrajectorySampling(
            time_horizon=4, interval_length=0.5
        )
        self._hidden_layer_dim = hidden_layer_dim
        self._lr = lr
        self._checkpoint_path = checkpoint_path
        self.model = _EgoStatusMLP(hidden_layer_dim, self._trajectory_sampling.num_poses)
        self.variables = None
        self._jit_apply = jax.jit(self.model.apply)

    def name(self) -> str:
        return self.__class__.__name__

    def initialize(self) -> None:
        if self.variables is not None:
            return  # idempotent — see DiffusionDriveAgent.initialize
        if self._checkpoint_path:
            import orbax.checkpoint as ocp

            self.variables = ocp.StandardCheckpointer().restore(self._checkpoint_path)
        else:
            self.variables = self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))

    def get_sensor_config(self) -> SensorConfig:
        return SensorConfig.build_no_sensors()

    def get_feature_builders(self) -> List[AbstractFeatureBuilder]:
        return [EgoStatusFeatureBuilder()]

    def get_target_builders(self) -> List[AbstractTargetBuilder]:
        return [TrajectoryTargetBuilder(self._trajectory_sampling)]

    def forward(self, features: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.variables is None:
            self.initialize()
        poses = self._jit_apply(self.variables, jnp.asarray(features["ego_status"]))
        return {"trajectory": np.asarray(poses)}

    def compute_loss(self, features, targets, predictions):
        return jnp.mean(jnp.abs(predictions["trajectory"] - targets["trajectory"]))

    def get_optimizers(self):
        return optax.adam(self._lr)
