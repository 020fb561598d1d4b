"""PDM-Closed planner + metric caching tests on a synthetic straight road."""

import numpy as np
import pytest

from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
from diffusiondrive_tpu.common.dataloader import MetricCacheLoader, SceneLoader
from diffusiondrive_tpu.common.enums import StateIndex
from diffusiondrive_tpu.planning.pdm_closed.planner import PDMClosedConfig, PDMClosedPlanner


# shared fixture (also used by quickstart + bench); re-exported for older tests
from diffusiondrive_tpu.utils.synthetic import make_straight_map  # noqa: E402


@pytest.fixture(scope="module")
def scene_and_map(synthetic_log):
    logs_dir, blobs_dir = synthetic_log
    scene_filter = SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=14)
    loader = SceneLoader(logs_dir, blobs_dir, scene_filter, SensorConfig.build_no_sensors(),
                         build_map_api=False)
    scene = loader.get_scene_from_token(loader.tokens[0])
    # the synthetic log routes through rb1/rb2 region (ego at x=6)
    for frame in scene.frames:
        frame.roadblock_ids = ["rb1", "rb2", "rb3"]
    return scene, make_straight_map()


def test_planner_follows_lane_and_brakes(scene_and_map):
    scene, map_api = scene_and_map
    planner = PDMClosedPlanner()
    poses, times = planner.compute_planner_trajectory(scene, map_api)

    assert poses.shape == (51, 3)
    assert times[-1] == pytest.approx(5.0)
    # starts at ego (x=6 global), moves forward, stays on the lane
    assert poses[0, 0] == pytest.approx(6.0, abs=1.5)
    assert np.all(np.diff(poses[:, 0]) >= -1e-6)
    assert np.abs(poses[:, 1]).max() < 2.5
    # there is a stopped vehicle at global x=16: the planner must not blast
    # through it at full target speed — end speed well below free flow
    end_speed = np.linalg.norm(poses[-1, :2] - poses[-2, :2]) / 0.1
    assert end_speed < 5.0, end_speed
    # and must stop short of the obstacle's rear face (~13.7 m)
    assert poses[-1, 0] < 16.0


def test_planner_free_road_accelerates(scene_and_map):
    scene, map_api = scene_and_map
    # remove the parked vehicle
    import copy

    free_scene = copy.deepcopy(scene)
    for frame in free_scene.frames:
        ann = frame.annotations
        ann.boxes = np.zeros((0, 7), np.float32)
        ann.names = []
        ann.velocity_3d = np.zeros((0, 3), np.float32)
        ann.instance_tokens = []
        ann.track_tokens = []
    planner = PDMClosedPlanner()
    poses, _ = planner.compute_planner_trajectory(free_scene, map_api)
    end_speed = np.linalg.norm(poses[-1, :2] - poses[-2, :2]) / 0.1
    assert end_speed > 5.0, end_speed  # accelerating toward the speed limit


def test_metric_caching_and_scoring(scene_and_map, tmp_path):
    from diffusiondrive_tpu.agents.constant_velocity_agent import ConstantVelocityAgent
    from diffusiondrive_tpu.common.dataclasses import TrajectorySampling
    from diffusiondrive_tpu.evaluate.pdm_score import pdm_score
    from diffusiondrive_tpu.evaluate.simulator import PDMSimulator
    from diffusiondrive_tpu.planning.metric_caching import MetricCacheProcessor

    scene, map_api = scene_and_map
    processor = MetricCacheProcessor(str(tmp_path / "cache"))
    path = processor.compute_metric_cache(scene, map_api)
    assert path is not None and path.exists()
    # resumable: second call returns early
    assert processor.compute_metric_cache(scene, map_api) == path

    loader = MetricCacheLoader(tmp_path / "cache")
    cache = loader.get_from_token(scene.scene_metadata.initial_token)
    assert cache.pdm_poses.shape == (51, 3)
    assert cache.tracks.valid.sum() == 1  # one GT track
    assert cache.drivable.valid.sum() >= 2

    # score the CV agent: it drives 4 m/s into the parked car -> collision
    agent_input = scene.get_agent_input()
    traj = ConstantVelocityAgent().compute_trajectory(agent_input)
    result = pdm_score(cache, traj, PDMSimulator(TrajectorySampling(num_poses=40, interval_length=0.1)))
    assert result.no_at_fault_collisions == 0.0
    assert result.score == 0.0
