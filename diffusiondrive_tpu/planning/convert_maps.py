"""Offline converter: nuplan GPKG maps -> LocalMapAPI pickle records.

Replaces the runtime nuplan map API dependency (GPKG/SQLite via
fiona/geopandas, SURVEY §2.9) with a one-time offline conversion. Run this
once per map location on a machine with `geopandas` installed; the resulting
`<location>.ddmap.pkl` files are what `planning/map_api.get_maps_api` loads —
pure-numpy at runtime, no geo stack needed.

Layer mapping (nuplan-maps-v1.0 GPKG):
  lanes_polygons          -> LANE           (baseline from baseline_paths)
  lane_connectors         -> LANE_CONNECTOR
  lane_groups_polygons    -> ROADBLOCK
  lane_group_connectors   -> ROADBLOCK_CONNECTOR
  intersections           -> INTERSECTION
  generic_drivable_areas  -> DRIVABLE_AREA
  carpark_areas           -> CARPARK_AREA
  walkways                -> WALKWAYS
  crosswalks              -> CROSSWALK

Graph fields: lanes carry parent roadblock (lane_group_fid) and outgoing
lane-connector successors; roadblocks chain through lane_group_connectors.

The conversion is split so the schema logic is testable without the geo
stack: `rows_from_gpkg` (geopandas IO -> plain row dicts with numpy geometry)
feeds `build_map_objects` (pure: fid normalization, graph building, roadblock
graph derivation). Unit tests exercise the pure half with fixture rows
mirroring the GPKG schema (`tests/test_convert_maps.py`).

Usage:
    python -m diffusiondrive_tpu.planning.convert_maps \
        --nuplan-maps-root $NUPLAN_MAPS_ROOT --output-dir $DD_MAPS_ROOT \
        [--locations us-ma-boston ...]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from diffusiondrive_tpu.evaluate.observation import MapLayer
from diffusiondrive_tpu.planning.map_api import LocalMapAPI, MapObjectData

logger = logging.getLogger(__name__)

MAP_LOCATIONS = ("sg-one-north", "us-ma-boston", "us-nv-las-vegas-strip", "us-pa-pittsburgh-hazelwood")

POLYGON_LAYERS = {
    "lanes_polygons": MapLayer.LANE,
    "lane_connectors": MapLayer.LANE_CONNECTOR,
    "lane_groups_polygons": MapLayer.ROADBLOCK,
    "lane_group_connectors": MapLayer.ROADBLOCK_CONNECTOR,
    "intersections": MapLayer.INTERSECTION,
    "generic_drivable_areas": MapLayer.DRIVABLE_AREA,
    "carpark_areas": MapLayer.CARPARK_AREA,
    "walkways": MapLayer.WALKWAYS,
    "crosswalks": MapLayer.CROSSWALK,
}

BASELINE_LAYER = "baseline_paths"


# --------------------------------------------------------------------------- #
# Geometry extraction (shapely objects -> numpy; used only on the IO side)
# --------------------------------------------------------------------------- #


def _exterior(geom) -> Optional[np.ndarray]:
    """Largest exterior ring of a (Multi)Polygon as (N, 2)."""
    if geom is None or geom.is_empty:
        return None
    if geom.geom_type == "MultiPolygon":
        geom = max(geom.geoms, key=lambda g: g.area)
    if geom.geom_type != "Polygon":
        return None
    return np.asarray(geom.exterior.coords, dtype=np.float64)[:, :2]


def _line_coords(line) -> Optional[np.ndarray]:
    if line is None or line.is_empty:
        return None
    if line.geom_type == "MultiLineString":
        line = max(line.geoms, key=lambda g: g.length)
    if line.geom_type != "LineString":
        return None
    return np.asarray(line.coords, dtype=np.float64)[:, :2]


def baseline_poses_from_coords(xy: Optional[np.ndarray]) -> Optional[np.ndarray]:
    """(M, 2) polyline -> (M, 3) poses; headings from segment directions."""
    if xy is None or len(xy) < 2:
        return None
    d = np.diff(xy, axis=0)
    headings = np.arctan2(d[:, 1], d[:, 0])
    headings = np.concatenate([headings, headings[-1:]])
    return np.concatenate([xy, headings[:, None]], axis=1)


# --------------------------------------------------------------------------- #
# Pure schema logic over plain row dicts
# --------------------------------------------------------------------------- #


def _fid(value) -> Optional[str]:
    """Normalize a GPKG fid (int/float/str, possibly NaN) to a string token."""
    if value is None or _isnan(value):
        return None
    if isinstance(value, float) and value.is_integer():
        return str(int(value))
    return str(value)


def _isnan(value) -> bool:
    try:
        return bool(np.isnan(value))
    except (TypeError, ValueError):
        return False


def build_map_objects(
    layer_rows: Dict[str, List[dict]], location: str = "local"
) -> LocalMapAPI:
    """Pure conversion of GPKG-schema row dicts into a LocalMapAPI.

    `layer_rows[layer_name]` is a list of dicts with the GPKG columns used:
      - all polygon layers: `fid`, `polygon` ((N,2) ndarray);
      - lanes_polygons: + `lane_group_fid`, `speed_limit_mps`;
      - lane_connectors: + `lane_group_connector_fid`, `exit_lane_fid`,
        `entry_lane_fid`, `speed_limit_mps`;
      - baseline_paths: `lane_fid` or `lane_connector_fid`, `coords`
        ((M,2) ndarray polyline).
    """
    # baseline paths keyed by lane / lane-connector fid
    baselines: Dict[str, np.ndarray] = {}
    for row in layer_rows.get(BASELINE_LAYER, []):
        poses = baseline_poses_from_coords(row.get("coords"))
        if poses is None:
            continue
        for col in ("lane_fid", "lane_connector_fid"):
            token = _fid(row.get(col))
            if token is not None:
                baselines[token] = poses

    # lane connectors define the lane graph: exit_lane -> connector -> entry_lane
    lane_succ: Dict[str, List[str]] = {}
    lane_pred: Dict[str, List[str]] = {}
    for row in layer_rows.get("lane_connectors", []):
        token = _fid(row.get("fid"))
        exit_lane = _fid(row.get("exit_lane_fid"))
        entry_lane = _fid(row.get("entry_lane_fid"))
        if token is None:
            continue
        if exit_lane:
            lane_succ.setdefault(exit_lane, []).append(token)
            lane_pred.setdefault(token, []).append(exit_lane)
        if entry_lane:
            lane_succ.setdefault(token, []).append(entry_lane)
            lane_pred.setdefault(entry_lane, []).append(token)

    objects: List[MapObjectData] = []
    for layer_name, layer_id in POLYGON_LAYERS.items():
        for row in layer_rows.get(layer_name, []):
            token = _fid(row.get("fid"))
            ring = row.get("polygon")
            if ring is None or token is None:
                continue
            parent = None
            speed_limit = None
            if layer_id in (MapLayer.LANE, MapLayer.LANE_CONNECTOR):
                parent = _fid(row.get("lane_group_fid")) or _fid(row.get("lane_group_connector_fid"))
                sl = row.get("speed_limit_mps")
                speed_limit = float(sl) if sl is not None and not _isnan(sl) else None
            objects.append(
                MapObjectData(
                    token=token,
                    layer=layer_id,
                    polygon=np.asarray(ring, dtype=np.float64),
                    baseline=baselines.get(token),
                    outgoing=lane_succ.get(token, []),
                    incoming=lane_pred.get(token, []),
                    parent_token=parent,
                    speed_limit=speed_limit,
                )
            )

    # roadblock graph from lane graph: parent(succ(lane)) are successors
    by_token = {o.token: o for o in objects}
    rb_succ: Dict[str, set] = {}
    for o in objects:
        if o.layer in (MapLayer.LANE, MapLayer.LANE_CONNECTOR) and o.parent_token:
            for nxt in o.outgoing:
                nxt_obj = by_token.get(nxt)
                if nxt_obj and nxt_obj.parent_token and nxt_obj.parent_token != o.parent_token:
                    rb_succ.setdefault(o.parent_token, set()).add(nxt_obj.parent_token)
    for o in objects:
        if o.layer in (MapLayer.ROADBLOCK, MapLayer.ROADBLOCK_CONNECTOR):
            o.outgoing = sorted(rb_succ.get(o.token, set()))
    rb_pred: Dict[str, List[str]] = {}
    for src, dsts in rb_succ.items():
        for dst in dsts:
            rb_pred.setdefault(dst, []).append(src)
    for o in objects:
        if o.layer in (MapLayer.ROADBLOCK, MapLayer.ROADBLOCK_CONNECTOR):
            o.incoming = sorted(rb_pred.get(o.token, []))

    logger.info("%s: converted %d map objects", location, len(objects))
    return LocalMapAPI(objects, location)


# --------------------------------------------------------------------------- #
# GPKG IO (geopandas side)
# --------------------------------------------------------------------------- #


def rows_from_gpkg(gpkg_path: Path) -> Dict[str, List[dict]]:
    """Read the used GPKG layers into plain row dicts with numpy geometry."""
    import geopandas as gpd

    rows: Dict[str, List[dict]] = {}
    for layer_name in list(POLYGON_LAYERS) + [BASELINE_LAYER]:
        try:
            df = gpd.read_file(gpkg_path, layer=layer_name)
        except Exception:
            logger.warning("%s: layer %s missing", gpkg_path, layer_name)
            continue
        out: List[dict] = []
        for _, row in df.iterrows():
            record = {c: row.get(c) for c in df.columns if c != "geometry"}
            if layer_name == BASELINE_LAYER:
                record["coords"] = _line_coords(row.geometry)
            else:
                record["polygon"] = _exterior(row.geometry)
            out.append(record)
        rows[layer_name] = out
    return rows


def convert_location(gpkg_path: Path, location: str) -> LocalMapAPI:
    return build_map_objects(rows_from_gpkg(gpkg_path), location)


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--nuplan-maps-root", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--locations", nargs="*", default=list(MAP_LOCATIONS))
    parser.add_argument("--map-version", default="nuplan-maps-v1.0")
    args = parser.parse_args()

    for location in args.locations:
        # nuplan layout: <root>/<location>/<version>/map.gpkg (or 9.17.1964/..)
        candidates = sorted(Path(args.nuplan_maps_root, location).rglob("*.gpkg"))
        if not candidates:
            logger.error("no GPKG found for %s", location)
            continue
        api = convert_location(candidates[-1], location)
        out = Path(args.output_dir) / f"{location}.ddmap.pkl"
        api.save(out)
        logger.info("wrote %s", out)


if __name__ == "__main__":
    main()
