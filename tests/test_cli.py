"""CLI entry-point test: run_pdm_score main end to end on synthetic data."""

import sys

import numpy as np
import pandas as pd
import yaml

from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
from diffusiondrive_tpu.common.dataloader import SceneLoader

from test_runner import build_caches


def test_run_pdm_score_cli(synthetic_log, tmp_path, monkeypatch):
    logs_dir, blobs_dir = synthetic_log
    loader = SceneLoader(logs_dir, blobs_dir,
                         SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=1),
                         SensorConfig.build_no_sensors(), build_map_api=False)
    cache_dir = tmp_path / "metric_cache"
    build_caches(loader.tokens, cache_dir)

    # split restricted to one token
    split = tmp_path / "split.yaml"
    with open(split, "w") as fp:
        yaml.safe_dump({"tokens": [loader.tokens[0]]}, fp)

    out_dir = tmp_path / "out"
    from diffusiondrive_tpu.script.run_pdm_score import main

    monkeypatch.setattr(sys, "argv", [
        "prog",
        "--agent", "constant_velocity_agent",
        "--navsim-log-path", str(logs_dir),
        "--sensor-blobs-path", str(blobs_dir),
        "--metric-cache-path", str(cache_dir),
        "--split", str(split),
        "--output-dir", str(out_dir),
        "--batch-size", "4",
    ])
    main()

    assert (out_dir / "config.yaml").exists()  # config snapshot
    csvs = list(out_dir.glob("*.csv"))
    assert len(csvs) == 1
    df = pd.read_csv(csvs[0])
    assert len(df) == 2  # one token + average row
    assert df.iloc[0]["token"] == loader.tokens[0]
    assert df.iloc[-1]["score"] > 0.9


def test_run_pdm_score_cli_composed_config(synthetic_log, tmp_path, monkeypatch):
    """One composed YAML (+ overrides) reproduces a full eval run, and the
    snapshot alone reproduces it again."""
    logs_dir, blobs_dir = synthetic_log
    loader = SceneLoader(logs_dir, blobs_dir,
                         SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=1),
                         SensorConfig.build_no_sensors(), build_map_api=False)
    cache_dir = tmp_path / "metric_cache"
    build_caches(loader.tokens, cache_dir)

    split = tmp_path / "split.yaml"
    with open(split, "w") as fp:
        yaml.safe_dump({"tokens": [loader.tokens[0]], "frame_interval": 1}, fp)

    out_dir = tmp_path / "out"
    from diffusiondrive_tpu.script.run_pdm_score import main

    monkeypatch.setenv("NAVSIM_EXP_ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", [
        "prog", "--config", "default_evaluation",
        "agent=constant_velocity_agent",
        f"navsim_log_path={logs_dir}",
        f"sensor_blobs_path={blobs_dir}",
        f"metric_cache_path={cache_dir}",
        f"split={split}",
        f"output_dir={out_dir}",
        "batch_size=4",
    ])
    main()

    snap = out_dir / "config.yaml"
    assert snap.exists()
    csvs = sorted(out_dir.glob("*.csv"))
    assert len(csvs) == 1
    df = pd.read_csv(csvs[0])
    assert df.iloc[-1]["score"] > 0.9

    # the snapshot alone reproduces the run
    import time

    time.sleep(1.1)  # CSV filenames have 1 s resolution
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(snap)])
    main()
    csvs2 = sorted(out_dir.glob("*.csv"))
    assert len(csvs2) == 2
    df2 = pd.read_csv(csvs2[-1])
    assert df2.iloc[-1]["score"] == df.iloc[-1]["score"]
