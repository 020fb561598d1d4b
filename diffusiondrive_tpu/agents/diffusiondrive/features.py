"""DiffusionDrive/Transfuser feature + target builders.

Parity: `navsim/agents/diffusiondrive/transfuser_features.py`:
- camera: crop l0/f0/r0 (rows 28:-28; side cams cols 416:-416), hstack,
  resize to 1024x256, scale to [0, 1] — output NHWC (the torch reference is
  CHW),
- lidar: filter z, split at 0.2 m, 2D histogram onto a 256x256 BEV grid
  (clip 5 points/cell, normalize),
- status: concat(driving_command[4], velocity[2], acceleration[2]),
- targets: GT trajectory, 30 nearest vehicle boxes (+labels), BEV semantic
  map (rasterized when a map API is attached, else zeros).

These are the host (numpy/cv2) builders used for dataset caching; the batched
eval pipeline has a fused device-side path in `ops/preprocessing.py`.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from diffusiondrive_tpu.common.dataclasses import AgentInput, Annotations, Scene
from diffusiondrive_tpu.common.enums import BoundingBox2DIndex, BoundingBoxIndex, LidarIndex
from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.training.abstract_feature_target_builder import (
    AbstractFeatureBuilder,
    AbstractTargetBuilder,
)


class TransfuserFeatureBuilder(AbstractFeatureBuilder):
    """Camera stitch + lidar BEV splat + ego status."""

    def __init__(self, config: TransfuserConfig):
        self._config = config

    def get_unique_name(self) -> str:
        return "transfuser_feature"

    def compute_features(self, agent_input: AgentInput) -> Dict[str, np.ndarray]:
        return {
            "camera_feature": self._get_camera_feature(agent_input),
            "lidar_feature": self._get_lidar_feature(agent_input),
            "status_feature": np.concatenate(
                [
                    np.asarray(agent_input.ego_statuses[-1].driving_command, np.float32),
                    np.asarray(agent_input.ego_statuses[-1].ego_velocity, np.float32),
                    np.asarray(agent_input.ego_statuses[-1].ego_acceleration, np.float32),
                ]
            ),
        }

    def _get_camera_feature(self, agent_input: AgentInput) -> np.ndarray:
        """Stitched (256, 1024, 3) uint8 front view.

        Kept uint8 end-to-end: the model normalizes to [0, 1] in-graph
        (`transfuser_model.py:DiffusionDriveModel.__call__`), so the
        host->device copy and the on-disk feature cache move/store 1 byte/px
        instead of a float32 (4x), which dominates the sensor-path eval cost
        through a slow interconnect."""
        import cv2

        cameras = agent_input.cameras[-1]
        l0 = cameras.cam_l0.image[28:-28, 416:-416]
        f0 = cameras.cam_f0.image[28:-28]
        r0 = cameras.cam_r0.image[28:-28, 416:-416]
        stitched = np.concatenate([l0, f0, r0], axis=1)
        return cv2.resize(stitched, (self._config.camera_width, self._config.camera_height))

    def _get_lidar_feature(self, agent_input: AgentInput) -> np.ndarray:
        """(256, 256, C) histogram splat (`transfuser_features.py:79-138`)."""
        cfg = self._config
        pc = agent_input.lidars[-1].lidar_pc[LidarIndex.POSITION].T  # (N, 3)

        pc = pc[pc[:, 2] < cfg.max_height_lidar]
        below = pc[pc[:, 2] <= cfg.lidar_split_height]
        above = pc[pc[:, 2] > cfg.lidar_split_height]

        def splat(points: np.ndarray) -> np.ndarray:
            xbins = np.linspace(
                cfg.lidar_min_x, cfg.lidar_max_x,
                int((cfg.lidar_max_x - cfg.lidar_min_x) * cfg.pixels_per_meter) + 1,
            )
            ybins = np.linspace(
                cfg.lidar_min_y, cfg.lidar_max_y,
                int((cfg.lidar_max_y - cfg.lidar_min_y) * cfg.pixels_per_meter) + 1,
            )
            hist = np.histogramdd(points[:, :2], bins=(xbins, ybins))[0]
            hist = np.minimum(hist, cfg.hist_max_per_pixel)
            return hist / cfg.hist_max_per_pixel

        above_feat = splat(above)
        if cfg.use_ground_plane:
            features = np.stack([splat(below), above_feat], axis=-1)
        else:
            features = above_feat[..., None]
        return features.astype(np.float32)


class RawSensorFeatureBuilder(AbstractFeatureBuilder):
    """Minimal-host-work variant: raw camera crops + padded point cloud.

    Host does only JPEG decode and PCD parse; stitching/resize and the BEV
    histogram run fused on device (`ops/preprocessing.py`). Used by
    `DiffusionDriveAgent(preprocess_on_device=True)` for batched evaluation.
    """

    def __init__(self, config: TransfuserConfig, max_points: int = 131072):
        self._config = config
        self._max_points = max_points

    def get_unique_name(self) -> str:
        return "transfuser_raw_feature"

    def compute_features(self, agent_input: AgentInput) -> Dict[str, np.ndarray]:
        from diffusiondrive_tpu.ops.preprocessing import pad_point_cloud

        cameras = agent_input.cameras[-1]
        points, valid = pad_point_cloud(agent_input.lidars[-1].lidar_pc, self._max_points)
        return {
            "camera_l0": cameras.cam_l0.image,
            "camera_f0": cameras.cam_f0.image,
            "camera_r0": cameras.cam_r0.image,
            "lidar_points": points,
            "lidar_valid": valid,
            "status_feature": np.concatenate(
                [
                    np.asarray(agent_input.ego_statuses[-1].driving_command, np.float32),
                    np.asarray(agent_input.ego_statuses[-1].ego_velocity, np.float32),
                    np.asarray(agent_input.ego_statuses[-1].ego_acceleration, np.float32),
                ]
            ),
        }


class TransfuserTargetBuilder(AbstractTargetBuilder):
    """GT trajectory + nearest agent boxes + BEV semantic map."""

    def __init__(self, config: TransfuserConfig):
        self._config = config

    def get_unique_name(self) -> str:
        return "transfuser_target"

    def compute_targets(self, scene: Scene) -> Dict[str, np.ndarray]:
        cfg = self._config
        trajectory = scene.get_future_trajectory(cfg.trajectory_sampling.num_poses).poses.astype(np.float32)
        frame_idx = scene.scene_metadata.num_history_frames - 1
        annotations = scene.frames[frame_idx].annotations
        ego_pose = scene.frames[frame_idx].ego_status.ego_pose

        agent_states, agent_labels = self._compute_agent_targets(annotations)
        bev_semantic_map = self._compute_bev_semantic_map(annotations, scene, ego_pose)

        return {
            "trajectory": trajectory,
            "agent_states": agent_states,
            "agent_labels": agent_labels,
            "bev_semantic_map": bev_semantic_map,
        }

    def _compute_agent_targets(self, annotations: Annotations) -> Tuple[np.ndarray, np.ndarray]:
        """30 nearest in-range vehicle boxes (`transfuser_features.py:176-222`)."""
        cfg = self._config
        max_agents = cfg.num_bounding_boxes
        states: List[np.ndarray] = []
        for box, name in zip(annotations.boxes, annotations.names):
            x, y = box[BoundingBoxIndex.X], box[BoundingBoxIndex.Y]
            if name == "vehicle" and (
                cfg.lidar_min_x <= x <= cfg.lidar_max_x and cfg.lidar_min_y <= y <= cfg.lidar_max_y
            ):
                states.append(
                    np.array(
                        [x, y, box[BoundingBoxIndex.HEADING], box[BoundingBoxIndex.LENGTH],
                         box[BoundingBoxIndex.WIDTH]],
                        dtype=np.float32,
                    )
                )

        agent_states = np.zeros((max_agents, BoundingBox2DIndex.size()), np.float32)
        agent_labels = np.zeros(max_agents, bool)
        if states:
            arr = np.stack(states)
            order = np.argsort(np.linalg.norm(arr[:, :2], axis=-1))[:max_agents]
            arr = arr[order]
            agent_states[: len(arr)] = arr
            agent_labels[: len(arr)] = True
        return agent_states, agent_labels

    def _compute_bev_semantic_map(self, annotations: Annotations, scene: Scene, ego_pose) -> np.ndarray:
        """7-class BEV semantic raster. Map layers need a map API; box classes
        come from annotations alone (`transfuser_features.py:225-330`)."""
        import cv2

        cfg = self._config
        bev = np.zeros(cfg.bev_semantic_frame, dtype=np.int64)

        if scene.map_api is not None:
            from diffusiondrive_tpu.planning.bev_raster import rasterize_map_layers

            bev = rasterize_map_layers(scene.map_api, ego_pose, cfg)

        # box classes: 4 = static objects, 5 = vehicles, 6 = pedestrians
        box_classes = {
            4: ("czone_sign", "barrier", "traffic_cone", "generic_object"),
            5: ("vehicle",),
            6: ("pedestrian",),
        }
        for label, names in box_classes.items():
            mask = np.zeros(cfg.bev_semantic_frame[::-1], dtype=np.uint8)
            for name, box in zip(annotations.names, annotations.boxes):
                if name not in names:
                    continue
                x, y, heading = box[BoundingBoxIndex.X], box[BoundingBoxIndex.Y], box[BoundingBoxIndex.HEADING]
                length, width = box[BoundingBoxIndex.LENGTH], box[BoundingBoxIndex.WIDTH]
                from diffusiondrive_tpu.evaluate.state_array import box_to_corners

                corners = box_to_corners(
                    np.float64(x), np.float64(y), np.float64(heading), np.float64(length), np.float64(width)
                )
                pixels = self._coords_to_pixel(corners.reshape(-1, 1, 2))
                cv2.fillPoly(mask, [pixels], color=255)
            mask = np.rot90(mask)[::-1]
            bev[mask > 0] = label

        return bev.astype(np.int32)

    def _coords_to_pixel(self, coords: np.ndarray) -> np.ndarray:
        """Local (x fwd, y left) meters -> BEV pixel indices
        (`transfuser_features.py:380-387`)."""
        pixel_center = np.array([[0.0, self._config.bev_pixel_width / 2.0]])
        return ((coords / self._config.bev_pixel_size) + pixel_center).astype(np.int32)
