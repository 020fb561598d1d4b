"""Tests for the vectorized scoring geometry (vs matplotlib.path / brute force)."""

import numpy as np
import jax.numpy as jnp
from matplotlib.path import Path as MplPath

from diffusiondrive_tpu.evaluate.geometry import (
    points_in_polygons,
    polygons_intersect,
    project_onto_polyline,
    segment_intersects_polygon,
)
from diffusiondrive_tpu.evaluate.observation import pad_rings
from diffusiondrive_tpu.evaluate.state_array import box_to_corners


def random_convex_polygon(rng, n=6, scale=5.0, center=(0, 0)):
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(1.0, scale, n)
    return np.stack([center[0] + r * np.cos(angles), center[1] + r * np.sin(angles)], axis=-1)


def test_points_in_polygons_matches_mpl():
    rng = np.random.default_rng(0)
    polys = [random_convex_polygon(rng, n, center=rng.uniform(-10, 10, 2)) for n in (4, 5, 6, 7)]
    # non-convex polygon (star)
    angles = np.linspace(0, 2 * np.pi, 10, endpoint=False)
    radii = np.where(np.arange(10) % 2 == 0, 6.0, 2.5)
    star = np.stack([radii * np.cos(angles), radii * np.sin(angles)], axis=-1)
    polys.append(star)

    padded = pad_rings(polys, max_vertices=12)
    points = rng.uniform(-12, 12, size=(300, 2)).astype(np.float32)

    ours = np.asarray(points_in_polygons(jnp.asarray(points), jnp.asarray(padded)))
    for p_idx, poly in enumerate(polys):
        ref = MplPath(poly).contains_points(points)
        # boundary-grazing points may differ; require > 99% agreement
        agreement = (ours[:, p_idx] == ref).mean()
        assert agreement > 0.99, f"polygon {p_idx}: agreement {agreement}"


def test_boxes_intersect_cases():
    def ring(cx, cy, h, l, w):
        c = box_to_corners(np.float32(cx), np.float32(cy), np.float32(h), np.float32(l), np.float32(w))
        return jnp.asarray(np.concatenate([c, c[..., :1, :]], axis=-2))  # close ring

    a = ring(0, 0, 0.0, 4, 2)
    assert bool(polygons_intersect(a, ring(3, 0, 0.0, 4, 2)))      # overlapping
    assert bool(polygons_intersect(a, ring(4, 0, 0.0, 4, 2)))      # touching edges
    assert not bool(polygons_intersect(a, ring(10, 0, 0.0, 4, 2)))  # separated
    assert bool(polygons_intersect(a, ring(0, 0, 0.7, 1, 1)))      # contained, rotated
    assert bool(polygons_intersect(ring(0, 0, 0.7, 1, 1), a))      # contains (reverse)
    assert bool(polygons_intersect(a, ring(2.9, 2.9, np.pi / 4, 4, 2)))  # corner clip


def test_batched_intersections_broadcast():
    rng = np.random.default_rng(1)
    B, T, O = 2, 5, 3
    ego = np.zeros((B, T, 5, 2), np.float32)
    for b in range(B):
        for t in range(T):
            c = box_to_corners(np.float32(t * 2.0), np.float32(b * 10.0), 0.0, 4.0, 2.0)
            ego[b, t] = np.concatenate([c, c[:1]], axis=0)
    tracks = np.zeros((T, O, 5, 2), np.float32)
    for t in range(T):
        for o in range(O):
            c = box_to_corners(np.float32(o * 4.0), np.float32(0.0), 0.0, 3.0, 2.0)
            tracks[t, o] = np.concatenate([c, c[:1]], axis=0)

    hits = np.asarray(polygons_intersect(jnp.asarray(ego)[:, :, None], jnp.asarray(tracks)[None]))
    assert hits.shape == (B, T, O)
    # batch 0 (y=0) must hit nearby tracks; batch 1 (y=10) never
    assert hits[0].any()
    assert not hits[1].any()
    # ego at x=0 overlaps track at x=0 (distance 0) but not track at x=8
    assert hits[0, 0, 0]
    assert not hits[0, 0, 2]


def test_segment_intersects_polygon():
    c = box_to_corners(np.float32(5.0), np.float32(0.0), 0.0, 2.0, 2.0)
    poly = jnp.asarray(np.concatenate([c, c[:1]], axis=0))
    assert bool(segment_intersects_polygon(jnp.asarray([0.0, 0.0]), jnp.asarray([10.0, 0.0]), poly))
    assert not bool(segment_intersects_polygon(jnp.asarray([0.0, 5.0]), jnp.asarray([10.0, 5.0]), poly))
    # endpoint inside
    assert bool(segment_intersects_polygon(jnp.asarray([5.0, 0.0]), jnp.asarray([20.0, 0.0]), poly))


def test_project_onto_polyline():
    line = jnp.asarray(np.array([[0, 0], [10, 0], [10, 10]], np.float32))
    pts = jnp.asarray(np.array([[5, 3], [-2, 0], [11, 4], [10, 20]], np.float32))
    arc = np.asarray(project_onto_polyline(pts, line))
    np.testing.assert_allclose(arc, [5.0, 0.0, 14.0, 20.0], atol=1e-5)
