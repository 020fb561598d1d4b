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


def test_default_anchor_asset_matches_regeneration():
    """The shipped `assets/default_plan_anchors.npy` is exactly what
    `synthetic_driving_trajectories` + k-means regenerate (provenance guard:
    the asset is derived data, never hand-edited)."""
    from pathlib import Path

    import diffusiondrive_tpu
    from diffusiondrive_tpu.utils.anchors import synthetic_driving_trajectories

    asset = Path(diffusiondrive_tpu.__file__).parent / "assets" / "default_plan_anchors.npy"
    shipped = np.load(asset)
    regen = kmeans_plan_anchors(synthetic_driving_trajectories(), 20)
    # allclose, not array_equal: numpy reduction-order changes across
    # versions/platforms can perturb the f64 k-means in the last ulps even
    # though the asset is semantically identical.
    np.testing.assert_allclose(shipped, regen, rtol=1e-5, atol=1e-5)


def test_synthetic_driving_prior_statistics():
    """The anchor source distribution looks like driving: forward-dominant,
    contains stops and real turns, stays inside the diffusion norm box."""
    from diffusiondrive_tpu.utils.anchors import synthetic_driving_trajectories

    tr = synthetic_driving_trajectories(num_samples=2048, seed=1)
    assert tr.shape == (2048, 8, 2)
    assert tr[..., 0].min() >= -1.2 and tr[..., 0].max() <= 55.7
    assert tr[..., 1].min() >= -20.0 and tr[..., 1].max() <= 26.0
    ends = tr[:, -1]
    assert (ends[:, 0] < 1.0).mean() > 0.02           # some stopped modes
    assert (np.abs(ends[:, 1]) > 5.0).mean() > 0.05   # some genuine turns
    assert (np.abs(ends[:, 1]) < 1.0).mean() > 0.4    # mostly straight
    assert np.median(ends[:, 0]) > 10.0               # forward progress dominates
