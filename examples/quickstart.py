"""Quickstart: synthetic scene -> planner -> PDMS score -> visualization.

Runs with no datasets (a synthetic straight-road scene is built in-process);
swap in real OpenScene paths for actual data. Mirrors the reference's
tutorial notebook flow (`tutorial/tutorial_visualization.ipynb`).

    python -m examples.quickstart [--out /tmp/dd_quickstart]
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np


def build_synthetic_dataset(root: Path):
    """One log of a 4 m/s straight drive with a parked car ahead."""
    import cv2

    from diffusiondrive_tpu.common.geometry import yaw_to_quaternion

    logs_dir, blobs_dir = root / "logs", root / "blobs"
    (blobs_dir / "cams").mkdir(parents=True, exist_ok=True)
    (blobs_dir / "lidar").mkdir(parents=True, exist_ok=True)
    logs_dir.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(0)
    cv2.imwrite(str(blobs_dir / "cams/img.jpg"),
                rng.integers(0, 255, (1080, 1920, 3), dtype=np.uint8))
    pts = np.zeros((6, 2000), np.float32)
    pts[0] = rng.uniform(-30, 30, 2000)
    pts[1] = rng.uniform(-30, 30, 2000)
    pts[2] = rng.uniform(0.3, 2.0, 2000)
    header = ("VERSION 0.7\nFIELDS x y z intensity ring lidar_id\nSIZE 4 4 4 4 4 4\n"
              "TYPE F F F F F F\nCOUNT 1 1 1 1 1 1\nWIDTH 2000\nHEIGHT 1\n"
              "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2000\nDATA binary\n")
    with open(blobs_dir / "lidar/pc.pcd", "wb") as fp:
        fp.write(header.encode())
        fp.write(pts.T.tobytes())

    cams = {
        name: dict(data_path="cams/img.jpg", sensor2lidar_rotation=np.eye(3),
                   sensor2lidar_translation=np.zeros(3), cam_intrinsic=np.eye(3),
                   distortion=np.zeros(5))
        for name in ["CAM_F0", "CAM_L0", "CAM_L1", "CAM_L2", "CAM_R0", "CAM_R1", "CAM_R2", "CAM_B0"]
    }
    frames = [
        dict(
            token=f"token_{i:03d}", timestamp=int(i * 5e5), log_name="demo_log",
            scene_token="demo_scene", map_location="synthetic", roadblock_ids=["rb1", "rb2", "rb3"],
            traffic_lights=[], ego2global_translation=[2.0 * i, 0.0, 0.0],
            ego2global_rotation=list(yaw_to_quaternion(0.0)),
            ego_dynamic_state=[4.0, 0.0, 0.0, 0.0], driving_command=[0, 1, 0, 0], cams=cams,
            lidar_path="lidar/pc.pcd",
            anns=dict(
                gt_boxes=np.array([[30.0 - 2.0 * i, 1.0, 0.5, 4.5, 2.0, 1.7, 0.0]], np.float32),
                gt_names=["vehicle"], gt_velocity_3d=np.zeros((1, 3), np.float32),
                instance_tokens=["inst_0"], track_tokens=["track_0"],
            ),
        )
        for i in range(15)
    ]
    with open(logs_dir / "demo_log.pkl", "wb") as fp:
        pickle.dump(frames, fp)
    return logs_dir, blobs_dir


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="/tmp/dd_quickstart")
    args = parser.parse_args()
    out = Path(args.out)

    from tests.test_pdm_closed import make_straight_map  # reusable synthetic map

    from diffusiondrive_tpu.agents.constant_velocity_agent import ConstantVelocityAgent
    from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
    from diffusiondrive_tpu.common.dataloader import MetricCacheLoader, SceneLoader
    from diffusiondrive_tpu.evaluate.runner import run_pdm_score_evaluation, write_score_csv
    from diffusiondrive_tpu.planning.metric_caching import MetricCacheProcessor
    from diffusiondrive_tpu.visualization import frame_plot_to_gif, plot_bev_frame

    logs_dir, blobs_dir = build_synthetic_dataset(out / "data")
    map_api = make_straight_map()

    loader = SceneLoader(logs_dir, blobs_dir, SceneFilter(), SensorConfig.build_no_sensors(),
                         build_map_api=False)
    print(f"{len(loader)} scenes: {loader.tokens}")

    # 1. metric caching (PDM-Closed runs per scene)
    processor = MetricCacheProcessor(str(out / "metric_cache"))
    for token in loader.tokens:
        scene = loader.get_scene_from_token(token)
        processor.compute_metric_cache(scene, map_api)
    print("metric caches written")

    # 2. batched PDMS evaluation of the constant-velocity baseline
    rows = run_pdm_score_evaluation(
        ConstantVelocityAgent(), loader, MetricCacheLoader(out / "metric_cache"), batch_size=8
    )
    csv = write_score_csv(rows, out / "eval")
    print(f"scores -> {csv}")
    for row in rows:
        print(f"  {row['token']}: PDMS={row['score']:.3f}")

    # 3. visualization
    scene = loader.get_scene_from_token(loader.tokens[0])
    scene.map_api = map_api
    frame_plot_to_gif(str(out / "scene.gif"), plot_bev_frame, scene)
    print(f"gif -> {out / 'scene.gif'}")


if __name__ == "__main__":
    main()
