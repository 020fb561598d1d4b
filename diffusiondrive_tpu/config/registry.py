"""Agent registry + dataclass config composition.

Replaces the Hydra `instantiate(_target_=...)` pattern (SURVEY §5.6) with an
explicit registry: agents register under a name; entry points build them from
a name + kwargs dict (optionally loaded from a YAML file). Keeps the
"swap the agent via config" workflow without the Hydra dependency.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

_AGENTS: Dict[str, Callable[..., Any]] = {}


def register_agent(name: str):
    def wrap(factory):
        _AGENTS[name] = factory
        return factory

    return wrap


def available_agents():
    _ensure_builtins()
    return sorted(_AGENTS)


def build_agent(name: str, **kwargs):
    _ensure_builtins()
    if name not in _AGENTS:
        raise KeyError(f"Unknown agent '{name}'. Available: {available_agents()}")
    return _AGENTS[name](**kwargs)


def _ensure_builtins() -> None:
    """Register built-in agents lazily (avoids import cycles)."""
    if _AGENTS:
        return
    from diffusiondrive_tpu.agents.constant_velocity_agent import ConstantVelocityAgent
    from diffusiondrive_tpu.agents.ego_status_mlp_agent import EgoStatusMLPAgent
    from diffusiondrive_tpu.agents.human_agent import HumanAgent

    _AGENTS.setdefault("constant_velocity_agent", ConstantVelocityAgent)
    _AGENTS.setdefault("human_agent", HumanAgent)
    _AGENTS.setdefault("ego_status_mlp_agent", EgoStatusMLPAgent)

    def _diffusiondrive(**kwargs):
        from diffusiondrive_tpu.agents.diffusiondrive.agent import DiffusionDriveAgent
        from diffusiondrive_tpu.models.config import TransfuserConfig

        config_kwargs = kwargs.pop("config", {}) or {}
        if isinstance(kwargs.get("dtype"), str):
            # YAML configs name the compute dtype as a string ("bfloat16",
            # "float32"); params stay fp32 either way (mixed precision)
            import jax.numpy as jnp

            kwargs["dtype"] = getattr(jnp, kwargs["dtype"])
        return DiffusionDriveAgent(config=TransfuserConfig(**config_kwargs), **kwargs)

    def _transfuser(**kwargs):
        return _diffusiondrive(trajectory_head_type="mlp", **kwargs)

    def _vanilla_ddim(**kwargs):
        # ablation: 20-step full DDIM rollout (vs 2-step truncated) —
        # the reference's "10x reduction" comparison baseline
        config_kwargs = kwargs.pop("config", {}) or {}
        config_kwargs.setdefault("diffusion_test_steps", 20)
        return _diffusiondrive(config=config_kwargs, **kwargs)

    def _diffusiondrive_nuscenes(**kwargs):
        # nuScenes variant: ResNet-50 encoders, 6-pose horizon at 0.5 s
        from diffusiondrive_tpu.common.dataclasses import TrajectorySampling

        config_kwargs = kwargs.pop("config", {}) or {}
        config_kwargs.setdefault("image_architecture", "resnet50")
        config_kwargs.setdefault("lidar_architecture", "resnet50")
        config_kwargs.setdefault(
            "trajectory_sampling", TrajectorySampling(time_horizon=3, interval_length=0.5)
        )
        return _diffusiondrive(config=config_kwargs, **kwargs)

    def _diffusion_policy(**kwargs):
        # ablation: vanilla diffusion-policy head — ConditionalUnet1D denoiser,
        # full-range training noise, 20-step DDIM from pure noise
        # (`modules/conditional_unet1d.py`; SURVEY §2.5 ablation config #2)
        return _diffusiondrive(trajectory_head_type="unet", **kwargs)

    _AGENTS.setdefault("diffusiondrive_agent", _diffusiondrive)
    _AGENTS.setdefault("transfuser_agent", _transfuser)
    _AGENTS.setdefault("diffusion_policy_agent", _diffusion_policy)
    _AGENTS.setdefault("diffusiondrive_vanilla_ddim_agent", _vanilla_ddim)
    _AGENTS.setdefault("diffusiondrive_nuscenes_agent", _diffusiondrive_nuscenes)


def agent_from_config(agent_cfg: Dict[str, Any]):
    """Build an agent from a composed config group: {name: ..., **kwargs}."""
    kwargs = dict(agent_cfg)
    name = kwargs.pop("name")
    return build_agent(name, **kwargs)


def load_yaml(path: Optional[str]) -> Dict[str, Any]:
    if not path:
        return {}
    import yaml

    with open(path) as fp:
        return yaml.safe_load(fp) or {}


def load_split(path: Optional[str]) -> Dict[str, Any]:
    """Load a train/test split YAML (see `splits/`): scene-filter fields plus
    optional log_names/tokens lists and the OpenScene `data_split` subdir.
    Mirrors the reference's train_test_split + scene_filter config groups.
    A bare name (e.g. "navtest") resolves against the vendored `splits/`."""
    if path and not str(path).endswith((".yaml", ".yml")):
        from pathlib import Path

        candidate = Path(__file__).resolve().parents[2] / "splits" / f"{path}.yaml"
        if candidate.exists():
            path = str(candidate)
    data = load_yaml(path)
    return {
        "log_names": data.get("log_names"),
        "tokens": data.get("tokens"),
        "data_split": data.get("data_split"),
        "num_history_frames": data.get("num_history_frames", 4),
        "num_future_frames": data.get("num_future_frames", 10),
        "frame_interval": data.get("frame_interval"),
        "has_route": data.get("has_route", True),
        "max_scenes": data.get("max_scenes"),
    }


def scene_filter_from_split(split: Dict[str, Any]):
    """SceneFilter from a loaded split dict."""
    from diffusiondrive_tpu.common.dataclasses import SceneFilter

    return SceneFilter(
        num_history_frames=split.get("num_history_frames", 4),
        num_future_frames=split.get("num_future_frames", 10),
        frame_interval=split.get("frame_interval"),
        has_route=split.get("has_route", True),
        max_scenes=split.get("max_scenes"),
        log_names=split.get("log_names"),
        tokens=split.get("tokens"),
    )
