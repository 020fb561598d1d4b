"""Vectorized polygon geometry for on-device scoring.

The reference scorer leans on shapely/GEOS (STRtree `intersects` queries,
`shapely.vectorized.contains`, linestring projection —
`pdm_occupancy_map.py:44,97,209`, `pdm_scorer.py:240-498`). Those are
host-side, per-object, sequential. Here every predicate is a dense, padded,
branch-free array op so the whole scorer jits and shards over scenes:

- `points_in_polygons`: crossing-number test against padded vertex rings
- `polygons_intersect`: general simple-polygon overlap = any edge pair
  crosses OR either contains a vertex of the other
- `segment_intersects_polygon`: for the front-bumper collision test
- `project_onto_polyline`: arc-length projection for the progress metric

Padding convention: each polygon is (V_max, 2) with a vertex-count; padded
slots repeat the last valid vertex, producing zero-length edges that no
predicate counts. At scorer scale (<=41 steps x ~64 obstacles x 5-point ego
rings) the dense form is tiny for the VPU; no spatial index needed.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _edges(polygons: jnp.ndarray) -> tuple:
    """(..., V, 2) ring -> edge starts/ends (wrapping last->first)."""
    starts = polygons
    ends = jnp.roll(polygons, -1, axis=-2)
    return starts, ends


def points_in_polygons(points: jnp.ndarray, polygons: jnp.ndarray) -> jnp.ndarray:
    """Crossing-number point-in-polygon.

    :param points: (..., 2)
    :param polygons: (..., P, V, 2) padded vertex rings (pad = repeat last
        vertex); leading dims broadcast against the points' leading dims.
    :return: bool (..., P)
    """
    px = points[..., 0][..., None, None]  # (..., 1, 1)
    py = points[..., 1][..., None, None]

    rolled = jnp.roll(polygons, -1, axis=-2)
    sx, sy = polygons[..., 0], polygons[..., 1]   # (..., P, V)
    ex, ey = rolled[..., 0], rolled[..., 1]

    straddles = (sy > py) != (ey > py)            # (..., P, V)
    denom = ey - sy
    x_at_y = sx + (py - sy) * (ex - sx) / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    crossings = straddles & (px < x_at_y)
    return jnp.sum(crossings, axis=-1) % 2 == 1


def _orient(ax, ay, bx, by, cx, cy):
    """Signed area orientation of triangle abc."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segments_intersect(a0, a1, b0, b1) -> jnp.ndarray:
    """Proper/touching segment intersection; inputs (..., 2) broadcastable."""
    d1 = _orient(b0[..., 0], b0[..., 1], b1[..., 0], b1[..., 1], a0[..., 0], a0[..., 1])
    d2 = _orient(b0[..., 0], b0[..., 1], b1[..., 0], b1[..., 1], a1[..., 0], a1[..., 1])
    d3 = _orient(a0[..., 0], a0[..., 1], a1[..., 0], a1[..., 1], b0[..., 0], b0[..., 1])
    d4 = _orient(a0[..., 0], a0[..., 1], a1[..., 0], a1[..., 1], b1[..., 0], b1[..., 1])

    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))

    def on_segment(px, py, q0, q1, d):
        collinear = jnp.abs(d) < _EPS
        within = (
            (px <= jnp.maximum(q0[..., 0], q1[..., 0]) + _EPS)
            & (px >= jnp.minimum(q0[..., 0], q1[..., 0]) - _EPS)
            & (py <= jnp.maximum(q0[..., 1], q1[..., 1]) + _EPS)
            & (py >= jnp.minimum(q0[..., 1], q1[..., 1]) - _EPS)
        )
        return collinear & within

    touch = (
        on_segment(a0[..., 0], a0[..., 1], b0, b1, d1)
        | on_segment(a1[..., 0], a1[..., 1], b0, b1, d2)
        | on_segment(b0[..., 0], b0[..., 1], a0, a1, d3)
        | on_segment(b1[..., 0], b1[..., 1], a0, a1, d4)
    )
    return proper | touch


def polygons_intersect(poly_a: jnp.ndarray, poly_b: jnp.ndarray) -> jnp.ndarray:
    """Overlap test between two batches of simple polygons.

    :param poly_a: (..., Va, 2) rings
    :param poly_b: (..., Vb, 2) rings (broadcast-compatible batch dims)
    :return: bool (...) — True when the polygons touch/overlap/contain.
    """
    a0, a1 = _edges(poly_a)
    b0, b1 = _edges(poly_b)

    # all edge pairs: (..., Va, Vb)
    edge_hits = segments_intersect(
        a0[..., :, None, :], a1[..., :, None, :], b0[..., None, :, :], b1[..., None, :, :]
    )
    any_edge = jnp.any(edge_hits, axis=(-1, -2))

    # containment: first vertex of one inside the other
    a_in_b = points_in_polygons(poly_a[..., 0, :], poly_b[..., None, :, :])[..., 0]
    b_in_a = points_in_polygons(poly_b[..., 0, :], poly_a[..., None, :, :])[..., 0]
    return any_edge | a_in_b | b_in_a


def segment_intersects_polygon(s0: jnp.ndarray, s1: jnp.ndarray, polygon: jnp.ndarray) -> jnp.ndarray:
    """Segment-vs-polygon intersection (edges or either endpoint inside).

    :param s0, s1: (..., 2) segment endpoints
    :param polygon: (..., V, 2) rings
    :return: bool (...)
    """
    p0, p1 = _edges(polygon)
    hits = segments_intersect(s0[..., None, :], s1[..., None, :], p0, p1)
    any_edge = jnp.any(hits, axis=-1)
    inside = points_in_polygons(s0, polygon[..., None, :, :])[..., 0]
    return any_edge | inside


def project_onto_polyline(points: jnp.ndarray, polyline: jnp.ndarray) -> jnp.ndarray:
    """Arc-length of the nearest point on a polyline (shapely `project`).

    :param points: (..., 2)
    :param polyline: (L, 2) vertices
    :return: (...) arc-length values
    """
    seg_start = polyline[:-1]                      # (L-1, 2)
    seg_vec = polyline[1:] - polyline[:-1]
    seg_len2 = jnp.sum(seg_vec**2, axis=-1)
    seg_len = jnp.sqrt(seg_len2)
    cum_len = jnp.concatenate([jnp.zeros(1, polyline.dtype), jnp.cumsum(seg_len)])[:-1]  # (L-1,)

    rel = points[..., None, :] - seg_start          # (..., L-1, 2)
    t = jnp.sum(rel * seg_vec, axis=-1) / jnp.where(seg_len2 < _EPS, _EPS, seg_len2)
    t = jnp.clip(t, 0.0, 1.0)
    proj = seg_start + t[..., None] * seg_vec
    dist2 = jnp.sum((points[..., None, :] - proj) ** 2, axis=-1)

    best = jnp.argmin(dist2, axis=-1)
    best_t = jnp.take_along_axis(t, best[..., None], axis=-1)[..., 0]
    best_cum = cum_len[best]
    best_seg = seg_len[best]
    return best_cum + best_t * best_seg


def polyline_arclength(polyline: jnp.ndarray) -> jnp.ndarray:
    """Total arc length of a polyline."""
    return jnp.sum(jnp.linalg.norm(jnp.diff(polyline, axis=0), axis=-1))
