"""Metric caching against a city-scale map (VERDICT r2 #6).

The reference leans on GEOS STRtree for map queries
(`pdm_occupancy_map.py:44`); `LocalMapAPI` uses vectorized center/radius
prefilters instead. This test proves the host map/caching path — proximity
queries, drivable-map extraction, route correction, PDM-Closed rollout —
stays correct AND tractable at O(10^3) map objects x O(10^2) scenes, and
prints the measured scenes/s (recorded in docs/STATUS.md).
"""

import time

import numpy as np
import pytest

from diffusiondrive_tpu.evaluate.observation import MapLayer
from diffusiondrive_tpu.planning.map_api import LocalMapAPI, MapObjectData


def make_city_map(blocks_x: int = 24, blocks_y: int = 12, block_len: float = 50.0,
                  width: float = 8.0):
    """Grid city: blocks_x*blocks_y roadblocks, one lane each, plus an
    intersection + crosswalk + walkway per block -> 5 objects per block.
    Lanes chain west->east along each row (the route runs along row 0)."""
    objects = []
    for j in range(blocks_y):
        y0 = j * 30.0
        for i in range(blocks_x):
            x0, x1 = i * block_len, (i + 1) * block_len
            rect = np.array([[x0, y0 - width / 2], [x1, y0 - width / 2],
                             [x1, y0 + width / 2], [x0, y0 + width / 2]])
            rb, lane = f"rb_{j}_{i}", f"lane_{j}_{i}"
            objects.append(MapObjectData(
                token=rb, layer=MapLayer.ROADBLOCK, polygon=rect,
                outgoing=[f"rb_{j}_{i+1}"] if i + 1 < blocks_x else [],
                incoming=[f"rb_{j}_{i-1}"] if i > 0 else []))
            bx = np.arange(x0, x1 + 1.0, 2.0)
            baseline = np.stack([bx, np.full_like(bx, y0), np.zeros_like(bx)], -1)
            objects.append(MapObjectData(
                token=lane, layer=MapLayer.LANE, polygon=rect, baseline=baseline,
                outgoing=[f"lane_{j}_{i+1}"] if i + 1 < blocks_x else [],
                incoming=[f"lane_{j}_{i-1}"] if i > 0 else [],
                parent_token=rb, speed_limit=15.0))
            objects.append(MapObjectData(
                token=f"int_{j}_{i}", layer=MapLayer.INTERSECTION,
                polygon=rect + np.array([block_len / 2, 15.0])))
            objects.append(MapObjectData(
                token=f"cw_{j}_{i}", layer=MapLayer.CROSSWALK,
                polygon=(rect * 0.2 + np.array([x0, y0 + 12.0]))))
            objects.append(MapObjectData(
                token=f"ww_{j}_{i}", layer=MapLayer.WALKWAYS,
                polygon=(rect + np.array([0.0, -14.0]))))
    return LocalMapAPI(objects, "city")


@pytest.fixture(scope="module")
def city_map():
    api = make_city_map()
    assert len(api._objects) == 24 * 12 * 5  # 1440 objects
    return api


def test_proximity_queries_at_scale(city_map):
    """Correctness + speed of the query layer the planner hammers."""
    start = time.process_time()  # CPU time: wall lies under xdist contention
    for x in np.linspace(0, 1000, 200):
        out = city_map.get_proximal_map_objects((x, 0.0), 100.0,
                                                [MapLayer.ROADBLOCK, MapLayer.LANE,
                                                 MapLayer.INTERSECTION])
        assert out[MapLayer.LANE], f"no lanes near x={x}"
        for lane in out[MapLayer.LANE]:
            assert np.linalg.norm(lane.center - [x, 0.0]) <= 100.0 + lane.radius
    elapsed = time.process_time() - start
    assert elapsed < 5.0, f"200 proximity queries took {elapsed:.1f}s cpu"

    token, dist = city_map.get_distance_to_nearest_map_object((125.0, 0.0), MapLayer.LANE)
    assert token == "lane_0_2" and dist == 0.0
    token, dist = city_map.get_distance_to_nearest_map_object((125.0, 9.0), MapLayer.LANE)
    assert token == "lane_0_2" and abs(dist - 5.0) < 1e-6


def test_metric_caching_at_city_scale(city_map, tmp_path):
    """O(10^2) scenes through the full PDM-Closed caching pipeline on the
    1440-object map; prints scenes/s for STATUS."""
    from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
    from diffusiondrive_tpu.common.dataloader import SceneLoader
    from diffusiondrive_tpu.planning.metric_caching import MetricCacheProcessor
    from diffusiondrive_tpu.utils.synthetic import build_synthetic_log

    num_scenes = 100
    logs_dir, blobs_dir = build_synthetic_log(
        tmp_path / "data", num_frames=num_scenes + 13, obstacle_x=None,
        roadblock_ids=tuple(f"rb_0_{i}" for i in range(12)))
    loader = SceneLoader(logs_dir, blobs_dir, SceneFilter(frame_interval=1),
                         SensorConfig.build_no_sensors(), build_map_api=False)
    tokens = loader.tokens[:num_scenes]
    assert len(tokens) == num_scenes

    processor = MetricCacheProcessor(str(tmp_path / "cache"))
    start = time.perf_counter()
    cpu_start = time.process_time()
    written = 0
    for token in tokens:
        scene = loader.get_scene_from_token(token)
        out = processor.compute_metric_cache(scene, city_map)
        written += out is not None
    cpu_elapsed = time.process_time() - cpu_start
    elapsed = time.perf_counter() - start
    assert written == num_scenes
    print(f"\nmetric caching on 1440-object map: {num_scenes / elapsed:.1f} scenes/s "
          f"({elapsed:.1f}s wall, {cpu_elapsed:.1f}s cpu)")
    # sanity bound so a regression to quadratic scans fails loudly; measured in
    # CPU time — wall time lies under pytest-xdist contention on a 1-core host
    # (0.64 wall-scenes/s with 4 workers vs 2+ standalone)
    assert num_scenes / cpu_elapsed > 1.0, f"{num_scenes / cpu_elapsed:.2f} cpu-scenes/s is pathological"
