"""Plan-anchor k-means generation tests (synthetic trajectory modes)."""

import gzip
import pickle
import sys

import numpy as np
import pytest

from diffusiondrive_tpu.utils.anchors import (
    collect_trajectories_from_cache,
    kmeans,
    kmeans_plan_anchors,
)


def _three_mode_trajectories(n_per_mode=40, num_poses=8, seed=0):
    """Straight / left-turn / right-turn futures with small noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(1, num_poses + 1, dtype=np.float64)
    modes = [
        np.stack([4.0 * t, np.zeros_like(t)], -1),            # straight
        np.stack([3.0 * t, 0.3 * t**2], -1),                  # left
        np.stack([3.0 * t, -0.3 * t**2], -1),                 # right
    ]
    rows = []
    for mode in modes:
        for _ in range(n_per_mode):
            rows.append(mode + rng.normal(0, 0.05, mode.shape))
    return np.stack(rows).astype(np.float32), np.stack(modes)


def test_kmeans_recovers_separated_clusters():
    rng = np.random.default_rng(1)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    pts = np.concatenate([c + rng.normal(0, 0.2, (50, 2)) for c in centers])
    out = kmeans(pts, 3, seed=2)
    # each true center has a centroid within noise distance
    for c in centers:
        assert np.min(np.linalg.norm(out - c, axis=-1)) < 0.3


def test_kmeans_rejects_too_few_samples():
    with pytest.raises(ValueError):
        kmeans(np.zeros((2, 4)), 3)


def test_plan_anchors_recover_modes():
    trajs, modes = _three_mode_trajectories()
    anchors = kmeans_plan_anchors(trajs, num_modes=3, seed=0)
    assert anchors.shape == (3, 8, 2)
    assert anchors.dtype == np.float32
    for mode in modes:
        err = np.linalg.norm(anchors - mode[None], axis=-1).mean(axis=-1).min()
        assert err < 0.1, err


def test_plan_anchors_deterministic():
    trajs, _ = _three_mode_trajectories()
    a = kmeans_plan_anchors(trajs, num_modes=5, seed=3)
    b = kmeans_plan_anchors(trajs, num_modes=5, seed=3)
    np.testing.assert_array_equal(a, b)


def test_cli_from_cache(tmp_path, monkeypatch):
    """End-to-end: gz target cache -> .npy anchors the agent can consume."""
    trajs, _ = _three_mode_trajectories(n_per_mode=10)
    cache = tmp_path / "cache" / "log_a"
    for i, traj in enumerate(trajs):
        token_dir = cache / f"tok{i:03d}"
        token_dir.mkdir(parents=True)
        with gzip.open(token_dir / "transfuser_target.gz", "wb") as fp:
            pickle.dump({"trajectory": traj, "agent_states": np.zeros((30, 5), np.float32)}, fp)

    collected = collect_trajectories_from_cache(tmp_path / "cache")
    assert collected.shape == (30, 8, 2 + 1) or collected.shape == (30, 8, 2)

    from diffusiondrive_tpu.script.make_plan_anchors import main

    out = tmp_path / "anchors.npy"
    monkeypatch.setattr(sys, "argv", ["make_plan_anchors", "--cache-path", str(tmp_path / "cache"),
                                      "--out", str(out), "--num-modes", "3"])
    main()
    anchors = np.load(out)
    assert anchors.shape == (3, 8, 2)
    assert np.isfinite(anchors).all()
