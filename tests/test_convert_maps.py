"""Map-converter tests: pure row-dict half AND the GPKG IO half.

Fixture rows mirror the nuplan-maps-v1.0 GPKG schema: `lanes_polygons`
(fid, lane_group_fid, speed_limit_mps), `lane_connectors` (fid,
lane_group_connector_fid, exit_lane_fid, entry_lane_fid), `baseline_paths`
(lane_fid / lane_connector_fid), plus area layers keyed by fid only.

The IO tests build a REAL .gpkg (SQLite + GeoPackageBinary WKB blobs, the
same on-disk format nuplan ships) and run `rows_from_gpkg` on it — the whole
conversion is stdlib-only (`planning/gpkg.py`), no geopandas anywhere.
"""

import sqlite3
import struct

import numpy as np
import pytest

from diffusiondrive_tpu.evaluate.observation import MapLayer
from diffusiondrive_tpu.planning.convert_maps import (
    baseline_poses_from_coords,
    build_map_objects,
    rows_from_gpkg,
    _fid,
)
from diffusiondrive_tpu.planning.gpkg import exterior_ring, line_coords, parse_gpkg_geometry


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


# --------------------------------------------------------------------------- #
# GPKG binary fixtures (hand-built WKB + GeoPackageBinary headers)
# --------------------------------------------------------------------------- #


def _wkb_points(xy, order="<", ndim=2):
    out = b""
    for p in xy:
        coords = list(p[:2]) + [0.0] * (ndim - 2)
        out += struct.pack(order + "d" * ndim, *coords)
    return out


def wkb_linestring(xy, order="<", ndim=2):
    bo = b"\x01" if order == "<" else b"\x00"
    gtype = 2 + (1000 if ndim == 3 else 0)
    return bo + struct.pack(order + "II", gtype, len(xy)) + _wkb_points(xy, order, ndim)


def wkb_polygon(rings, order="<", ndim=2):
    bo = b"\x01" if order == "<" else b"\x00"
    gtype = 3 + (1000 if ndim == 3 else 0)
    out = bo + struct.pack(order + "II", gtype, len(rings))
    for ring in rings:
        out += struct.pack(order + "I", len(ring)) + _wkb_points(ring, order, ndim)
    return out


def wkb_multipolygon(polys, order="<"):
    bo = b"\x01" if order == "<" else b"\x00"
    out = bo + struct.pack(order + "II", 6, len(polys))
    for rings in polys:
        out += wkb_polygon(rings, order)
    return out


def gp_blob(wkb, envelope_xy=None, empty=False):
    """GeoPackageBinary: 'GP' + version + flags + srs_id [+ envelope] + WKB."""
    flags = 0x01  # little-endian header
    body = b""
    if envelope_xy is not None:
        flags |= 0x02  # envelope indicator 1: [minx maxx miny maxy]
        body = struct.pack("<4d", *envelope_xy)
    if empty:
        flags |= 0x10  # spec bit 4; bit 5 (0x20) is ExtendedGeoPackageBinary
    return b"GP" + bytes([0, flags]) + struct.pack("<i", 4326) + body + wkb


def _build_gpkg(path):
    """Write a real GPKG mirroring `_fixture_rows` (same tokens/graph)."""
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)")
    conn.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT,"
        " geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT)")

    def add_layer(name, schema, rows):
        conn.execute(f'CREATE TABLE "{name}" (fid INTEGER PRIMARY KEY, {schema}, geom BLOB)')
        conn.execute("INSERT INTO gpkg_contents VALUES (?, 'features')", (name,))
        conn.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', 'GEOMETRY', 4326, 0, 0)",
            (name,))
        for row in rows:
            cols = ["fid"] + [c.split()[0] for c in schema.split(", ")] + ["geom"]
            conn.execute(
                f'INSERT INTO "{name}" ({", ".join(cols)}) VALUES ({", ".join("?" * len(cols))})',
                row)

    fx = _fixture_rows()
    add_layer("lanes_polygons", "lane_group_fid REAL, speed_limit_mps REAL", [
        (101, 11.0, 13.4, gp_blob(wkb_polygon([fx["lanes_polygons"][0]["polygon"]]),
                                  envelope_xy=(0, 50, -2, 2))),
        (102, 12.0, None, gp_blob(wkb_polygon([fx["lanes_polygons"][1]["polygon"]]))),
    ])
    add_layer("lane_connectors",
              "lane_group_connector_fid REAL, exit_lane_fid REAL, entry_lane_fid REAL, speed_limit_mps REAL", [
        (201, 21.0, 101.0, 102.0, 8.0,
         gp_blob(wkb_polygon([fx["lane_connectors"][0]["polygon"]]))),
    ])
    add_layer("lane_groups_polygons", "dummy TEXT", [
        # roadblock 11 as a MULTIpolygon whose LARGEST member is the real one
        (11, None, gp_blob(wkb_multipolygon(
            [[_rect(200, 200, 201, 201)], [fx["lane_groups_polygons"][0]["polygon"]]]))),
        # big-endian WKB must parse too
        (12, None, gp_blob(wkb_polygon([fx["lane_groups_polygons"][1]["polygon"]], order=">"))),
    ])
    add_layer("lane_group_connectors", "dummy TEXT", [
        (21, None, gp_blob(wkb_polygon([fx["lane_group_connectors"][0]["polygon"]]))),
    ])
    add_layer("intersections", "dummy TEXT", [
        # PolygonZ: z coords present on disk, dropped on read
        (31, None, gp_blob(wkb_polygon([fx["intersections"][0]["polygon"]], ndim=3))),
    ])
    add_layer("crosswalks", "dummy TEXT", [
        (41, None, gp_blob(wkb_polygon([fx["crosswalks"][0]["polygon"]]))),
        (42, None, None),                                       # NULL geometry
        (43, None, gp_blob(b"", empty=True)),                   # empty flag
    ])
    add_layer("baseline_paths", "lane_fid REAL, lane_connector_fid REAL", [
        (1, 101.0, None, gp_blob(wkb_linestring(fx["baseline_paths"][0]["coords"]))),
        (2, None, 201.0, gp_blob(wkb_linestring(fx["baseline_paths"][1]["coords"]))),
    ])
    conn.commit()
    conn.close()


def test_wkb_parser_primitives():
    sq = _rect(0, 0, 2, 2)
    geom = parse_gpkg_geometry(gp_blob(wkb_polygon([sq])))
    np.testing.assert_allclose(exterior_ring(geom), sq)
    # big-endian, Z-dim, and envelope round-trips
    np.testing.assert_allclose(
        exterior_ring(parse_gpkg_geometry(gp_blob(wkb_polygon([sq], order=">")))), sq)
    np.testing.assert_allclose(
        exterior_ring(parse_gpkg_geometry(gp_blob(wkb_polygon([sq], ndim=3)))), sq)
    np.testing.assert_allclose(
        exterior_ring(parse_gpkg_geometry(gp_blob(wkb_polygon([sq]), envelope_xy=(0, 2, 0, 2)))), sq)
    # multipolygon picks the largest member's exterior
    big, small = _rect(0, 0, 10, 10), _rect(50, 50, 51, 51)
    geom = parse_gpkg_geometry(gp_blob(wkb_multipolygon([[small], [big]])))
    np.testing.assert_allclose(exterior_ring(geom), big)
    # linestring
    line = np.array([[0.0, 0.0], [3.0, 4.0]])
    np.testing.assert_allclose(
        line_coords(parse_gpkg_geometry(gp_blob(wkb_linestring(line)))), line)
    # null / empty
    assert parse_gpkg_geometry(None) is None
    assert parse_gpkg_geometry(gp_blob(b"", empty=True)) is None
    # ExtendedGeoPackageBinary (flags bit 5): not WKB — must refuse loudly
    ext = bytearray(gp_blob(wkb_polygon([sq])))
    ext[3] |= 0x20
    with pytest.raises(ValueError, match="Extended"):
        parse_gpkg_geometry(bytes(ext))
    # EWKB type encoding: SRID/Z as flag bits instead of ISO +1000 offsets
    pts = np.column_stack([sq, np.zeros(len(sq))])  # with Z column
    body = struct.pack("<BI", 1, 0x20000000 | 0x80000000 | 3)  # SRID|Z|polygon
    body += struct.pack("<I", 4326)  # SRID payload
    body += struct.pack("<I", 1) + struct.pack("<I", len(pts))
    body += pts.astype("<f8").tobytes()
    np.testing.assert_allclose(exterior_ring(parse_gpkg_geometry(gp_blob(body))), sq)


def test_rows_from_real_gpkg(tmp_path):
    """The IO half reads an actual .gpkg file (STATUS round-2 gap #2)."""
    gpkg = tmp_path / "map.gpkg"
    _build_gpkg(gpkg)
    rows = rows_from_gpkg(gpkg)

    assert {r["fid"] for r in rows["lanes_polygons"]} == {101, 102}
    lane = next(r for r in rows["lanes_polygons"] if r["fid"] == 101)
    np.testing.assert_allclose(lane["polygon"], _fixture_rows()["lanes_polygons"][0]["polygon"])
    assert lane["speed_limit_mps"] == 13.4
    # NULL / empty geometries come back as None polygons
    crosswalk_rows = {r["fid"]: r["polygon"] for r in rows["crosswalks"]}
    assert crosswalk_rows[42] is None and crosswalk_rows[43] is None
    # missing layer (generic_drivable_areas etc.) is tolerated
    assert "generic_drivable_areas" not in rows


def test_convert_location_end_to_end_from_gpkg(tmp_path):
    """rows_from_gpkg -> build_map_objects yields the same graph as the
    row-dict fixtures: full converter parity from real GPKG bytes."""
    from diffusiondrive_tpu.planning.convert_maps import convert_location

    gpkg = tmp_path / "map.gpkg"
    _build_gpkg(gpkg)
    api = convert_location(gpkg, "fixture")

    assert api.get_map_object("101").outgoing == ["201"]
    assert api.get_map_object("201").outgoing == ["102"]
    assert api.get_map_object("11").outgoing == ["21"]
    assert api.get_map_object("21").outgoing == ["12"]
    assert api.get_map_object("101").baseline.shape == (11, 3)
    assert api.get_map_object("101").speed_limit == 13.4
    # the multipolygon roadblock kept its largest member
    rb = api.get_map_object("11")
    np.testing.assert_allclose(rb.polygon, _fixture_rows()["lane_groups_polygons"][0]["polygon"])
    # Z-coordinates dropped
    assert api.get_map_object("31").polygon.shape[1] == 2


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
