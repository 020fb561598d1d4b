"""Map-converter schema tests (pure row-dict half; no geopandas needed).

Fixture rows mirror the nuplan-maps-v1.0 GPKG schema: `lanes_polygons`
(fid, lane_group_fid, speed_limit_mps), `lane_connectors` (fid,
lane_group_connector_fid, exit_lane_fid, entry_lane_fid), `baseline_paths`
(lane_fid / lane_connector_fid), plus area layers keyed by fid only.
"""

import numpy as np

from diffusiondrive_tpu.evaluate.observation import MapLayer
from diffusiondrive_tpu.planning.convert_maps import (
    baseline_poses_from_coords,
    build_map_objects,
    _fid,
)


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64)


def _fixture_rows():
    """Two roadblocks joined by a connector roadblock; one lane each."""
    return {
        "lanes_polygons": [
            dict(fid=101.0, lane_group_fid=11.0, speed_limit_mps=13.4, polygon=_rect(0, -2, 50, 2)),
            dict(fid=102, lane_group_fid=12, speed_limit_mps=float("nan"), polygon=_rect(60, -2, 110, 2)),
        ],
        "lane_connectors": [
            dict(fid="201", lane_group_connector_fid=21, exit_lane_fid=101.0, entry_lane_fid=102,
                 speed_limit_mps=8.0, polygon=_rect(50, -2, 60, 2)),
        ],
        "lane_groups_polygons": [
            dict(fid=11, polygon=_rect(0, -4, 50, 4)),
            dict(fid=12, polygon=_rect(60, -4, 110, 4)),
        ],
        "lane_group_connectors": [
            dict(fid=21, polygon=_rect(50, -4, 60, 4)),
        ],
        "intersections": [dict(fid=31, polygon=_rect(45, -6, 65, 6))],
        "crosswalks": [dict(fid=41, polygon=_rect(48, -4, 52, 4))],
        "baseline_paths": [
            dict(lane_fid=101.0, lane_connector_fid=None,
                 coords=np.stack([np.arange(0.0, 51.0, 5.0), np.zeros(11)], -1)),
            dict(lane_fid=None, lane_connector_fid=201,
                 coords=np.array([[50.0, 0.0], [60.0, 0.0]])),
            dict(lane_fid=float("nan"), lane_connector_fid=float("nan"),
                 coords=np.array([[0.0, 0.0], [1.0, 0.0]])),  # orphan: dropped
        ],
    }


def test_fid_normalization():
    assert _fid(101.0) == "101"
    assert _fid(102) == "102"
    assert _fid("201") == "201"
    assert _fid(float("nan")) is None
    assert _fid(None) is None
    assert _fid(1.5) == "1.5"


def test_baseline_heading_computation():
    xy = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    poses = baseline_poses_from_coords(xy)
    assert poses.shape == (3, 3)
    np.testing.assert_allclose(poses[:, 2], [0.0, np.pi / 2, np.pi / 2])
    assert baseline_poses_from_coords(np.zeros((1, 2))) is None
    assert baseline_poses_from_coords(None) is None


def test_build_map_objects_layers_and_attributes():
    api = build_map_objects(_fixture_rows(), "fixture")
    lane = api.get_map_object("101")
    assert lane.layer == MapLayer.LANE
    assert lane.parent_token == "11"
    assert lane.speed_limit == 13.4
    assert lane.baseline is not None and lane.baseline.shape == (11, 3)

    lane2 = api.get_map_object("102")
    assert lane2.speed_limit is None  # NaN -> None
    assert lane2.baseline is None     # no baseline row

    conn = api.get_map_object("201")
    assert conn.layer == MapLayer.LANE_CONNECTOR
    assert conn.parent_token == "21"
    assert conn.baseline.shape == (2, 3)

    assert api.get_map_object("31").layer == MapLayer.INTERSECTION
    assert api.get_map_object("41").layer == MapLayer.CROSSWALK


def test_build_map_objects_lane_graph():
    api = build_map_objects(_fixture_rows())
    assert api.get_map_object("101").outgoing == ["201"]
    assert api.get_map_object("201").outgoing == ["102"]
    assert api.get_map_object("201").incoming == ["101"]
    assert api.get_map_object("102").incoming == ["201"]


def test_build_map_objects_roadblock_graph():
    api = build_map_objects(_fixture_rows())
    assert api.get_map_object("11").outgoing == ["21"]
    assert api.get_map_object("21").outgoing == ["12"]
    assert api.get_map_object("21").incoming == ["11"]
    assert api.get_map_object("12").incoming == ["21"]
    # interior-lane lookup works on the converted map
    assert [l.token for l in api.lanes_of_roadblock("11")] == ["101"]
    assert [l.token for l in api.lanes_of_roadblock("21")] == ["201"]


def test_converted_map_supports_route_search(tmp_path):
    """Round-trip save/load, then run the real BFS route machinery on it."""
    from diffusiondrive_tpu.planning.map_api import LocalMapAPI
    from diffusiondrive_tpu.planning.pdm_closed.graph_search import BreadthFirstSearchRoadBlock

    api = build_map_objects(_fixture_rows())
    api.save(tmp_path / "fixture.ddmap.pkl")
    api = LocalMapAPI.load(tmp_path / "fixture.ddmap.pkl")

    bfs = BreadthFirstSearchRoadBlock(api, "11", forward=True)
    path, found = bfs.search(["12"], max_depth=5)
    assert found and path == ["11", "21", "12"]


def test_rows_missing_fields_are_skipped():
    rows = {
        "lanes_polygons": [
            dict(fid=None, polygon=_rect(0, 0, 1, 1)),        # no fid
            dict(fid=7, polygon=None),                        # no geometry
            dict(fid=8, lane_group_fid=None, polygon=_rect(0, 0, 1, 1)),
        ],
    }
    api = build_map_objects(rows)
    assert api.get_map_object("7") is None
    obj = api.get_map_object("8")
    assert obj is not None and obj.parent_token is None and obj.speed_limit is None
