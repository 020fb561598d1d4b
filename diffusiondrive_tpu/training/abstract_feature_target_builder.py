"""Feature/target builder contracts.

Parity: `navsim/planning/training/abstract_feature_target_builder.py`.
Builders produce plain numpy dicts (NHWC); batching/device transfer happens in
the dataset / eval pipelines.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict

import numpy as np

from diffusiondrive_tpu.common.dataclasses import AgentInput, Scene


class AbstractFeatureBuilder(ABC):
    """Builds model input features from (unprivileged) AgentInput."""

    @abstractmethod
    def get_unique_name(self) -> str:
        ...

    @abstractmethod
    def compute_features(self, agent_input: AgentInput) -> Dict[str, np.ndarray]:
        ...


class AbstractTargetBuilder(ABC):
    """Builds training targets from (privileged) Scene."""

    @abstractmethod
    def get_unique_name(self) -> str:
        ...

    @abstractmethod
    def compute_targets(self, scene: Scene) -> Dict[str, np.ndarray]:
        ...
