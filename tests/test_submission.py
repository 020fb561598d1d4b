"""Submission tooling: create -> merge -> score-from-submission."""

import pickle
import sys

import numpy as np
import pandas as pd
import pytest

from diffusiondrive_tpu.agents.constant_velocity_agent import ConstantVelocityAgent
from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.script.run_create_submission_pickle import run_test_evaluation

from test_runner import build_caches


def test_submission_roundtrip(synthetic_log, tmp_path, monkeypatch):
    logs_dir, blobs_dir = synthetic_log
    loader = SceneLoader(
        logs_dir, blobs_dir,
        SceneFilter(num_history_frames=4, num_future_frames=10, frame_interval=1),
        SensorConfig.build_no_sensors(), build_map_api=False,
    )

    # 1. create
    predictions = run_test_evaluation(ConstantVelocityAgent(), loader)
    assert set(predictions) == set(loader.tokens)
    sub_a = tmp_path / "sub_a.pkl"
    with open(sub_a, "wb") as fp:
        pickle.dump({"team_name": "t", "authors": "a", "email": "e", "institution": "i",
                     "country": "c", "predictions": [dict(list(predictions.items())[:1])]}, fp)
    sub_b = tmp_path / "sub_b.pkl"
    with open(sub_b, "wb") as fp:
        pickle.dump({"team_name": "t", "authors": "a", "email": "e", "institution": "i",
                     "country": "c", "predictions": [dict(list(predictions.items())[1:])]}, fp)

    # 2. merge (CLI main)
    from diffusiondrive_tpu.script.run_merge_submission_pickles import main as merge_main

    merged_path = tmp_path / "merged.pkl"
    monkeypatch.setattr(sys, "argv", ["prog", str(sub_a), str(sub_b), "--output", str(merged_path)])
    merge_main()
    with open(merged_path, "rb") as fp:
        merged = pickle.load(fp)
    assert set(merged["predictions"][0]) == set(loader.tokens)

    # 3. score from submission (CLI main)
    cache_dir = tmp_path / "metric_cache"
    build_caches(loader.tokens, cache_dir)

    from diffusiondrive_tpu.script.run_pdm_score_from_submission import main as score_main

    out_dir = tmp_path / "out"
    monkeypatch.setattr(
        sys, "argv",
        ["prog", "--submission", str(merged_path), "--metric-cache-path", str(cache_dir),
         "--output-dir", str(out_dir)],
    )
    score_main()
    csvs = list(out_dir.glob("*.csv"))
    assert len(csvs) == 1
    df = pd.read_csv(csvs[0])
    assert df.iloc[-1]["token"] == "average"
    assert df.iloc[-1]["score"] > 0.9  # clean straight drive
