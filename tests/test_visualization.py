"""Smoke tests for the visualization stack on the synthetic scene."""

import numpy as np

from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
from diffusiondrive_tpu.common.dataloader import SceneLoader


def _scene(synthetic_log, sensors=False):
    logs_dir, blobs_dir = synthetic_log
    sensor_config = SensorConfig.build_all_sensors(include=[3]) if sensors else SensorConfig.build_no_sensors()
    loader = SceneLoader(
        logs_dir, blobs_dir,
        SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=14),
        sensor_config, build_map_api=False,
    )
    return loader.get_scene_from_token(loader.tokens[0])


def test_bev_plot_and_gif(synthetic_log, tmp_path):
    from diffusiondrive_tpu.agents.constant_velocity_agent import ConstantVelocityAgent
    from diffusiondrive_tpu.visualization import (
        frame_plot_to_gif,
        plot_bev_frame,
        plot_bev_with_agent,
    )
    import matplotlib.pyplot as plt

    scene = _scene(synthetic_log)
    fig, ax = plot_bev_frame(scene)
    assert len(ax.patches) >= 2  # at least ego + one annotation box
    plt.close(fig)

    fig, ax = plot_bev_with_agent(scene, ConstantVelocityAgent())
    assert len(ax.lines) == 2  # human + agent trajectories
    plt.close(fig)

    gif = tmp_path / "scene.gif"
    frame_plot_to_gif(str(gif), plot_bev_frame, scene, frame_indices=[3, 4])
    assert gif.exists() and gif.stat().st_size > 0


def test_bev_semantic_render():
    from diffusiondrive_tpu.visualization import render_bev_semantic_map

    raster = np.zeros((16, 32), np.int32)
    raster[4:8, :] = 1
    raster[0, 0] = 5
    img = render_bev_semantic_map(raster)
    assert img.shape == (16, 32, 3)
    assert tuple(img[0, 0]) == (70, 155, 221)
    assert tuple(img[5, 5]) == (224, 224, 224)


def test_camera_projection_and_tiles(synthetic_log):
    from diffusiondrive_tpu.visualization import (
        add_annotations_to_camera,
        add_lidar_to_camera,
        camera_tile,
        project_points_to_camera,
    )

    scene = _scene(synthetic_log, sensors=True)
    frame = scene.frames[3]
    cam = frame.cameras.cam_f0
    # forward-facing calibration: columns of sensor2lidar_rotation are the
    # camera axes in the lidar frame (right=-y, down=-z, forward=+x)
    cam.sensor2lidar_rotation = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
    cam.sensor2lidar_translation = np.array([1.5, 0.0, 1.6])
    cam.intrinsics = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]])

    pts = np.array([[10.0, 0.0, 1.6], [-5.0, 0.0, 1.6]])  # ahead / behind
    uv, ok = project_points_to_camera(pts, cam)
    assert ok[0] and not ok[1]
    assert abs(uv[0, 0] - 960) < 1 and abs(uv[0, 1] - 540) < 1  # straight ahead -> center

    out = add_annotations_to_camera(cam.image, cam, frame.annotations.boxes, frame.annotations.names)
    assert out.shape == cam.image.shape and (out != cam.image).any()

    out2 = add_lidar_to_camera(cam.image, cam, frame.lidar)
    assert out2.shape == cam.image.shape

    tile = camera_tile(frame.cameras)
    assert tile.ndim == 3 and tile.shape[0] >= cam.image.shape[0] - 1


def test_camera_grid_plots(synthetic_log):
    """3x3 camera grid with BEV center tile, in all three overlay modes."""
    import matplotlib.pyplot as plt

    from diffusiondrive_tpu.visualization import (
        plot_cameras_frame,
        plot_cameras_frame_with_annotations,
        plot_cameras_frame_with_lidar,
    )

    scene = _scene(synthetic_log, sensors=True)
    for fn in (plot_cameras_frame, plot_cameras_frame_with_lidar,
               plot_cameras_frame_with_annotations):
        fig, axes = fn(scene)
        assert axes.shape == (3, 3)
        # 8 camera tiles carry images; the BEV center tile carries patches
        n_images = sum(len(ax.images) for row in axes for ax in row)
        assert n_images == 8, n_images
        assert len(axes[1][1].patches) >= 1  # BEV center: ego box at least
        plt.close(fig)


def test_trajectory_camera_projection(synthetic_log):
    import numpy as np

    from diffusiondrive_tpu.visualization import add_trajectory_to_camera

    scene = _scene(synthetic_log, sensors=True)
    cam = scene.frames[3].cameras.cam_f0
    cam.sensor2lidar_rotation = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
    cam.sensor2lidar_translation = np.array([1.5, 0.0, 1.6])
    cam.intrinsics = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]])
    poses = np.stack([np.linspace(4, 20, 8), np.zeros(8), np.zeros(8)], -1)
    out = add_trajectory_to_camera(cam.image, cam, poses)
    assert out.shape == cam.image.shape and (out != cam.image).any()
