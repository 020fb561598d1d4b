"""Agent interface — the central NAVSIM-compatible contract.

Parity: `navsim/agents/abstract_agent.py` (AbstractAgent). JAX-native: agents
own a model + variables instead of being torch Modules; `forward` consumes a
batched numpy/jnp feature dict and returns a prediction dict; the
`compute_trajectory` template method (build features -> add batch dim ->
no-grad forward -> Trajectory) is preserved so PDMS harnesses run unchanged.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List

import numpy as np

from diffusiondrive_tpu.common.dataclasses import AgentInput, SensorConfig, Trajectory
from diffusiondrive_tpu.training.abstract_feature_target_builder import (
    AbstractFeatureBuilder,
    AbstractTargetBuilder,
)


class AbstractAgent(ABC):
    """Interface for an agent in the framework."""

    requires_scene: bool = False

    @abstractmethod
    def name(self) -> str:
        ...

    @abstractmethod
    def get_sensor_config(self) -> SensorConfig:
        ...

    @abstractmethod
    def initialize(self) -> None:
        """Load checkpoints / weights; called inside each eval worker."""
        ...

    def forward(self, features: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Batched forward pass: feature dict -> prediction dict."""
        raise NotImplementedError

    def get_feature_builders(self) -> List[AbstractFeatureBuilder]:
        raise NotImplementedError("No feature builders. Agent does not support training.")

    def get_target_builders(self) -> List[AbstractTargetBuilder]:
        raise NotImplementedError("No target builders. Agent does not support training.")

    def compute_trajectory(self, agent_input: AgentInput) -> Trajectory:
        """Template method: features -> batch dim -> forward -> Trajectory."""
        features: Dict[str, np.ndarray] = {}
        for builder in self.get_feature_builders():
            features.update(builder.compute_features(agent_input))
        features = {k: np.asarray(v)[None] for k, v in features.items()}
        predictions = self.forward(features)
        poses = np.asarray(predictions["trajectory"])[0]
        return Trajectory(poses.astype(np.float32))

    def compute_loss(
        self,
        features: Dict[str, Any],
        targets: Dict[str, Any],
        predictions: Dict[str, Any],
    ):
        raise NotImplementedError("No loss. Agent does not support training.")

    def get_optimizers(self):
        """Return an optax GradientTransformation (optionally with schedule)."""
        raise NotImplementedError("No optimizers. Agent does not support training.")

    def get_training_callbacks(self, output_dir: Any = None) -> List[Any]:
        """Callbacks for the Trainer's epoch loop (reference:
        `run_training.py:131` passes `agent.get_training_callbacks()`);
        `output_dir` lets visualization callbacks know where to write."""
        return []

    def set_mesh(self, mesh: Any) -> None:
        """Shard this agent's batched forward over a `jax.sharding.Mesh`.

        Default no-op: host-side agents (constant-velocity, human replay) have
        no device program. Device agents rebuild their jitted forward with the
        batch dim sharded over the mesh `data` axis so batched evaluation uses
        every chip of the slice (the reference scales this with Ray workers,
        `run_pdm_score.py:134-142`)."""
