"""DiffusionDrive agent: the flagship end-to-end planner.

Parity: `navsim/agents/diffusiondrive/transfuser_agent.py` (TransfuserAgent)
with the V2 model. Owns the Flax model + variables; `forward` runs the jitted
eval path (backbone + 2-step truncated DDIM decode) on device. Checkpoints
load via orbax; kmeans plan anchors can be swapped in from an .npy file.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusiondrive_tpu.agents.abstract_agent import AbstractAgent
from diffusiondrive_tpu.agents.diffusiondrive.features import (
    RawSensorFeatureBuilder,
    TransfuserFeatureBuilder,
    TransfuserTargetBuilder,
)
from diffusiondrive_tpu.common.dataclasses import SensorConfig
from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
from diffusiondrive_tpu.training.abstract_feature_target_builder import (
    AbstractFeatureBuilder,
    AbstractTargetBuilder,
)
from diffusiondrive_tpu.training.losses import transfuser_loss
from diffusiondrive_tpu.training.train import OptimizerConfig, build_optimizer


class DiffusionDriveAgent(AbstractAgent):
    """Truncated-diffusion end-to-end planner (camera + lidar fusion)."""

    requires_scene = False

    def __init__(
        self,
        config: TransfuserConfig = None,
        lr: float = 6e-4,
        checkpoint_path: Optional[str] = None,
        trajectory_head_type: str = "diffusion",
        dtype: Any = jnp.bfloat16,
        seed: int = 0,
        preprocess_on_device: bool = False,
        use_ema: bool = False,
    ):
        self._config = config or TransfuserConfig()
        self._lr = lr
        self._checkpoint_path = checkpoint_path
        self._use_ema = use_ema
        self._seed = seed
        self._preprocess_on_device = preprocess_on_device
        self.model = DiffusionDriveModel(self._config, trajectory_head_type=trajectory_head_type,
                                         dtype=dtype)
        self.variables = None
        self._mesh = None
        self._build_forwards()

    def _build_forwards(self) -> None:
        """jit the eval forwards; with a mesh, batch dims shard over `data`."""

        def _forward(variables, camera, lidar, status):
            return self.model.apply(
                variables, camera, lidar, status, rngs={"diffusion": jax.random.PRNGKey(7)}
            )

        def _forward_raw(variables, cam_l0, cam_f0, cam_r0, points, valid, status):
            # fused device preprocessing: stitch/resize + Pallas BEV splat
            from diffusiondrive_tpu.ops.preprocessing import lidar_bev, stitch_cameras

            camera = stitch_cameras(cam_l0, cam_f0, cam_r0,
                                    self._config.camera_height, self._config.camera_width)
            lidar = lidar_bev(points, valid, self._config, mesh=self._mesh)
            return _forward(variables, camera, lidar, status)

        if self._mesh is None:
            self._jit_forward = jax.jit(_forward)
            self._jit_forward_raw = jax.jit(_forward_raw)
        else:
            from diffusiondrive_tpu.parallel.mesh import batch_sharding, replicated

            batch = batch_sharding(self._mesh)
            repl = replicated(self._mesh)
            self._jit_forward = jax.jit(
                _forward, in_shardings=(repl, batch, batch, batch), out_shardings=batch
            )
            self._jit_forward_raw = jax.jit(
                _forward_raw,
                in_shardings=(repl,) + (batch,) * 6,
                out_shardings=batch,
            )

    def set_mesh(self, mesh) -> None:
        """Shard the planner forward's batch dim over the mesh `data` axis
        (SPMD batched evaluation over ICI, SURVEY §2.10). Callers must pad
        the eval batch to a multiple of `mesh.size` (the runner does)."""
        if mesh is self._mesh or (self._mesh is not None and mesh == self._mesh):
            return  # rebuilding jits here would recompile every forward
        self._mesh = mesh
        self._build_forwards()

    @property
    def config(self) -> TransfuserConfig:
        return self._config

    def name(self) -> str:
        return self.__class__.__name__

    def initialize(self) -> None:
        if self.variables is not None:
            # idempotent: the runner calls initialize() per evaluation run
            # (reference worker semantics), but re-running `jax.jit(model.init)`
            # builds a fresh jit wrapper whose cache never hits — a ~40 s XLA
            # recompile per run measured on v5e. Weights are fixed at
            # construction time, so the first init is the only one needed.
            return
        cfg = self._config
        if self._checkpoint_path and Path(self._checkpoint_path).suffix in (".pth", ".ckpt", ".pt", ".bin"):
            # published torch checkpoint (e.g. the 88.1-PDMS weights)
            from diffusiondrive_tpu.utils.port_transfuser import load_transfuser_checkpoint

            self.variables = load_transfuser_checkpoint(self._checkpoint_path, cfg)
        elif self._checkpoint_path:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            restored = ckptr.restore(Path(self._checkpoint_path).absolute())
            ckptr.close()
            # accept either bare model variables or a full Trainer checkpoint
            # (params/batch_stats/constants/opt_state[/ema_params]); with
            # use_ema=True the EMA weights drive inference
            params = restored.get("ema_params") if self._use_ema else None
            if params is None:
                if self._use_ema:
                    raise ValueError(f"use_ema=True but {self._checkpoint_path} has no ema_params")
                params = restored["params"]
            self.variables = {"params": params,
                              "batch_stats": restored.get("batch_stats", {}),
                              "constants": restored.get("constants", {})}
        else:
            rng = jax.random.PRNGKey(self._seed)
            camera = jnp.zeros((1, cfg.camera_height, cfg.camera_width, 3), jnp.float32)
            lidar = jnp.zeros(
                (1, cfg.lidar_resolution_height, cfg.lidar_resolution_width, cfg.lidar_in_channels),
                jnp.float32,
            )
            status = jnp.zeros((1, 8), jnp.float32)
            self.variables = jax.jit(self.model.init)(
                {"params": rng, "diffusion": rng, "dropout": rng}, camera, lidar, status
            )
        if cfg.plan_anchor_path and Path(cfg.plan_anchor_path).exists():
            anchors = np.load(cfg.plan_anchor_path).astype(np.float32)
            constants = dict(self.variables.get("constants", {}))
            constants["trajectory_head"] = {"plan_anchor": jnp.asarray(anchors)}
            self.variables = {**self.variables, "constants": constants}

    def get_sensor_config(self) -> SensorConfig:
        # Exactly the sensors the feature builder consumes, current frame
        # only: stitched l0/f0/r0 cameras + lidar (`features.py:58-61`;
        # reference `transfuser_features.py:64-77`). The reference loads all
        # 8 cameras (`transfuser_agent.py:108-110`) and throws 5 away — on
        # the host-bound eval path ~5/8 of the 1080p jpeg decodes per token
        # were pure waste. Agents that need every sensor can still use
        # `SensorConfig.build_all_sensors`.
        return SensorConfig(
            cam_f0=[3], cam_l0=[3], cam_l1=False, cam_l2=False,
            cam_r0=[3], cam_r1=False, cam_r2=False, cam_b0=False,
            lidar_pc=[3],
        )

    def get_feature_builders(self) -> List[AbstractFeatureBuilder]:
        if self._preprocess_on_device:
            return [RawSensorFeatureBuilder(self._config)]
        return [TransfuserFeatureBuilder(self._config)]

    def get_target_builders(self) -> List[AbstractTargetBuilder]:
        return [TransfuserTargetBuilder(self._config)]

    def forward(self, features: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.variables is None:
            self.initialize()
        if "camera_l0" in features:  # raw path: preprocessing fused on device
            out = self._jit_forward_raw(
                self.variables,
                jnp.asarray(features["camera_l0"]),
                jnp.asarray(features["camera_f0"]),
                jnp.asarray(features["camera_r0"]),
                jnp.asarray(features["lidar_points"]),
                jnp.asarray(features["lidar_valid"]),
                jnp.asarray(features["status_feature"], jnp.float32),
            )
        else:
            out = self._jit_forward(
                self.variables,
                # keep the camera's uint8 dtype: the model normalizes
                # in-graph and the H2D copy moves 4x fewer bytes
                jnp.asarray(features["camera_feature"]),
                jnp.asarray(features["lidar_feature"], jnp.float32),
                jnp.asarray(features["status_feature"], jnp.float32),
            )
        return {k: np.asarray(v, np.float32) for k, v in out.items()}

    def compute_loss(self, features, targets, predictions):
        return transfuser_loss(targets, predictions, self._config)["loss"]

    def get_training_callbacks(self, output_dir=None):
        from diffusiondrive_tpu.training.callbacks import (
            BEVVisualizationCallback,
            TimeLoggingCallback,
        )

        callbacks = [TimeLoggingCallback()]
        if output_dir is not None:
            callbacks.append(BEVVisualizationCallback(str(Path(output_dir) / "viz")))
        return callbacks

    def get_optimizers(self):
        opt_cfg = OptimizerConfig(lr=self._lr, weight_decay=self._config.weight_decay,
                                  image_encoder_lr_mult=self._config.cfg_lr_mult)
        if self.variables is None:
            self.initialize()
        return build_optimizer(opt_cfg, self.variables["params"])
