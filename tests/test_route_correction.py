"""Branch-covering tests for the full route-roadblock correction.

Parity target: `route_utils.py:15-216` (candidate scoring, off-route backward/
forward reconnection, gap bridging, loop removal). All scenarios run on small
synthetic maps built from `MapObjectData` records.
"""

import numpy as np
import pytest

from diffusiondrive_tpu.common.enums import StateIndex
from diffusiondrive_tpu.evaluate.observation import MapLayer
from diffusiondrive_tpu.planning.map_api import LocalMapAPI, MapObjectData
from diffusiondrive_tpu.planning.pdm_closed.np_geometry import polygon_intersection_area
from diffusiondrive_tpu.planning.pdm_closed.route_correction import (
    get_current_roadblock_candidates,
    remove_route_loops,
    route_roadblock_correction,
)


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)


def _chain_map(num_blocks=6, block_len=50.0, width=8.0, connector_idx=()):
    """Straight chain of roadblocks rb0 -> rb5, one lane each, along y=0."""
    objects = []
    for i in range(num_blocks):
        x0, x1 = i * block_len, (i + 1) * block_len
        layer = MapLayer.ROADBLOCK_CONNECTOR if i in connector_idx else MapLayer.ROADBLOCK
        objects.append(
            MapObjectData(
                token=f"rb{i}", layer=layer, polygon=_rect(x0, -width / 2, x1, width / 2),
                outgoing=[f"rb{i+1}"] if i + 1 < num_blocks else [],
                incoming=[f"rb{i-1}"] if i > 0 else [],
            )
        )
        bx = np.arange(x0, x1 + 1.0, 2.0)
        baseline = np.stack([bx, np.zeros_like(bx), np.zeros_like(bx)], axis=-1)
        objects.append(
            MapObjectData(
                token=f"lane{i}", layer=MapLayer.LANE, polygon=_rect(x0, -width / 2, x1, width / 2),
                baseline=baseline, parent_token=f"rb{i}",
                outgoing=[f"lane{i+1}"] if i + 1 < num_blocks else [],
                incoming=[f"lane{i-1}"] if i > 0 else [],
            )
        )
    return LocalMapAPI(objects, "chain")


def _ego(x, y=0.0, heading=0.0):
    state = np.zeros(StateIndex.size(), np.float64)
    state[StateIndex.X], state[StateIndex.Y], state[StateIndex.HEADING] = x, y, heading
    return state


def _route_dict(map_api, ids):
    return {t: map_api.get_map_object(t) for t in ids}


# --------------------------------------------------------------------------- #
# Candidate selection
# --------------------------------------------------------------------------- #


def test_candidates_prefer_on_route():
    map_api = _chain_map()
    # ego on the rb2/rb3 boundary: both are candidates; only rb3 is on route
    ego = _ego(150.0)
    best, cands = get_current_roadblock_candidates(ego, map_api, _route_dict(map_api, ["rb3", "rb4"]))
    assert best.token == "rb3"
    assert all(c.token in ("rb3",) for c in cands)


def test_candidates_fall_back_to_displacement():
    map_api = _chain_map()
    # nothing on route nearby: min-displacement qualifying block wins
    ego = _ego(130.0, y=1.0)
    best, _ = get_current_roadblock_candidates(ego, map_api, _route_dict(map_api, ["rb5"]))
    assert best.token == "rb2"


def test_candidates_heading_threshold_rejects_wrong_way():
    map_api = _chain_map()
    # driving against the lane direction: heading error ~pi > pi/4, so no lane
    # qualifies and the nearest roadblock is returned as a last resort
    ego = _ego(130.0, heading=np.pi)
    best, cands = get_current_roadblock_candidates(ego, map_api, _route_dict(map_api, ["rb2"]))
    assert best.token == "rb2"  # still nearest by raw displacement
    assert len(cands) >= 1


def test_candidates_nearest_fallback_when_nothing_proximal():
    map_api = _chain_map()
    ego = _ego(130.0, y=40.0)  # 36 m off the road; nothing within 1 m radius
    best, _ = get_current_roadblock_candidates(ego, map_api, _route_dict(map_api, ["rb2"]))
    assert best is not None and best.token == "rb2"


# --------------------------------------------------------------------------- #
# Fix 1: off-route start
# --------------------------------------------------------------------------- #


def test_on_route_start_keeps_route():
    map_api = _chain_map()
    ego = _ego(130.0)  # inside rb2
    ids = route_roadblock_correction(ego, map_api, _route_dict(map_api, ["rb2", "rb3", "rb4"]))
    assert ids == ["rb2", "rb3", "rb4"]


def test_off_route_behind_start_prepends_backward_path():
    map_api = _chain_map()
    ego = _ego(30.0)  # inside rb0; route starts at rb2
    ids = route_roadblock_correction(ego, map_api, _route_dict(map_api, ["rb2", "rb3"]))
    assert ids == ["rb0", "rb1", "rb2", "rb3"]


def test_off_route_ahead_of_start_trims_and_prepends():
    map_api = _chain_map()
    # route covers rb0..rb2 only; ego is in rb4, ahead of the whole route and
    # unreachable backward from rb0 -> backward search fails, forward search
    # from rb4 cannot reach rb0..rb2 either (one-way chain) -> route unchanged
    ids = route_roadblock_correction(_ego(230.0), map_api, _route_dict(map_api, ["rb0", "rb1", "rb2"]))
    assert ids == ["rb0", "rb1", "rb2"]


def test_off_route_forward_reconnection():
    """Ego on a side branch that merges into the route ahead."""
    map_api = _chain_map()
    objs = list(map_api._objects)
    # side branch: sb -> rb2 (merging), located below the chain near x in [50,100]
    objs.append(
        MapObjectData(token="sb", layer=MapLayer.ROADBLOCK, polygon=_rect(50, -20, 100, -12),
                      outgoing=["rb2"], incoming=[])
    )
    bx = np.arange(50.0, 101.0, 2.0)
    objs.append(
        MapObjectData(token="sblane", layer=MapLayer.LANE, polygon=_rect(50, -20, 100, -12),
                      baseline=np.stack([bx, np.full_like(bx, -16.0), np.zeros_like(bx)], -1),
                      parent_token="sb", outgoing=["lane2"], incoming=[])
    )
    map_api = LocalMapAPI(objs, "branch")
    ego = _ego(75.0, y=-16.0)  # on the side branch
    # route rb0..rb3 does NOT include sb; rb0 backward-search cannot reach sb
    # (sb has no outgoing into rb0's chain before rb2), so Fix 1 falls through
    # to the forward search: sb -> rb2 is found within route_ids[:3]
    ids = route_roadblock_correction(ego, map_api, _route_dict(map_api, ["rb0", "rb1", "rb2", "rb3"]))
    assert ids == ["sb", "rb2", "rb3"]


# --------------------------------------------------------------------------- #
# Fix 2: gap bridging
# --------------------------------------------------------------------------- #


def test_route_gap_is_bridged():
    map_api = _chain_map()
    ego = _ego(30.0)  # inside rb0
    # route skips rb1 and rb2: BFS must splice them back in
    ids = route_roadblock_correction(ego, map_api, _route_dict(map_api, ["rb0", "rb3", "rb4"]))
    assert ids == ["rb0", "rb1", "rb2", "rb3", "rb4"]


def test_multiple_gaps_bridged_with_offsets():
    map_api = _chain_map(num_blocks=8)
    ego = _ego(30.0)
    ids = route_roadblock_correction(ego, map_api, _route_dict(map_api, ["rb0", "rb2", "rb4", "rb6"]))
    assert ids == ["rb0", "rb1", "rb2", "rb3", "rb4", "rb5", "rb6"]


# --------------------------------------------------------------------------- #
# Fix 3: loop removal
# --------------------------------------------------------------------------- #


def test_loop_removed_at_reintersecting_connector():
    # two connectors sharing the same footprint = the route loops back
    objects = [
        MapObjectData(token="a", layer=MapLayer.ROADBLOCK, polygon=_rect(0, -4, 50, 4)),
        MapObjectData(token="c1", layer=MapLayer.ROADBLOCK_CONNECTOR, polygon=_rect(50, -4, 60, 4)),
        MapObjectData(token="b", layer=MapLayer.ROADBLOCK, polygon=_rect(60, -4, 110, 4)),
        MapObjectData(token="c2", layer=MapLayer.ROADBLOCK_CONNECTOR, polygon=_rect(52, -4, 62, 4)),
        MapObjectData(token="d", layer=MapLayer.ROADBLOCK, polygon=_rect(0, 4, 50, 12)),
    ]
    map_api = LocalMapAPI(objects, "loop")
    ids = remove_route_loops(["a", "c1", "b", "c2", "d"], map_api)
    assert ids == ["a", "c1", "b"]


def test_disjoint_connectors_keep_route():
    map_api = _chain_map(connector_idx=(1, 3))
    ids = remove_route_loops(["rb0", "rb1", "rb2", "rb3", "rb4"], map_api)
    assert ids == ["rb0", "rb1", "rb2", "rb3", "rb4"]


def test_polygon_intersection_area_accuracy():
    a = _rect(0, 0, 10, 10)
    b = _rect(5, 5, 15, 15)
    assert polygon_intersection_area(a, b) == pytest.approx(25.0, rel=0.05)
    assert polygon_intersection_area(a, _rect(20, 20, 30, 30)) == 0.0
    # non-convex: L-shape vs square overlapping only one arm
    l_shape = np.array([[0, 0], [10, 0], [10, 2], [2, 2], [2, 10], [0, 10]], dtype=np.float64)
    assert polygon_intersection_area(l_shape, _rect(4, 4, 8, 8)) == pytest.approx(0.0, abs=0.2)
    assert polygon_intersection_area(l_shape, _rect(4, -1, 8, 1)) == pytest.approx(4.0, rel=0.1)


# --------------------------------------------------------------------------- #
# Planner integration
# --------------------------------------------------------------------------- #


def test_planner_uses_corrected_route(synthetic_log):
    """Planner with an off-route start still plans along the corrected route."""
    from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
    from diffusiondrive_tpu.common.dataloader import SceneLoader
    from diffusiondrive_tpu.planning.pdm_closed.planner import PDMClosedPlanner
    from tests.test_pdm_closed import make_straight_map

    logs_dir, blobs_dir = synthetic_log
    scene_filter = SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=14)
    loader = SceneLoader(logs_dir, blobs_dir, scene_filter, SensorConfig.build_no_sensors(),
                         build_map_api=False)
    scene = loader.get_scene_from_token(loader.tokens[0])
    # ego sits at x=6 (rb1 of the straight map); declare a route starting at
    # rb2 only — correction must prepend rb1 via backward search
    for frame in scene.frames:
        frame.roadblock_ids = ["rb2", "rb3"]
    planner = PDMClosedPlanner()
    poses, times = planner.compute_planner_trajectory(scene, make_straight_map())
    assert "rb1" in planner._route_roadblock_dict
    assert poses.shape == (51, 3)
    assert np.all(np.diff(poses[:, 0]) >= -1e-6)
