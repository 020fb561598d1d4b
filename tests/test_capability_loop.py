"""Machinery test for the closed train->eval capability loop.

`run_capability_loop` is the whole-system proof (train the production model
on synthetic speed-fleet logs, then score trained-vs-untrained through the
real metric-cache + `run_pdm_score_evaluation` pipeline). The captured TPU
artifact `docs/capability_loop_r5.json` carries the margin evidence; this
test runs the identical code path end-to-end at the smallest viable size on
the CPU mesh (2 epochs is not enough training to assert a margin, but every
stage — fleet build, feature/target batching, Trainer fit + checkpoint,
metric caching, checkpoint-loaded eval — must execute and produce sane
scores)."""

import json

import numpy as np
import pytest


@pytest.mark.slow
def test_capability_loop_mini(tmp_path):
    from diffusiondrive_tpu.script.run_capability_loop import run_capability_loop

    results = run_capability_loop(
        tmp_path / "cap",
        num_frames=16,    # 3 tokens per speed log
        batch_size=4,
        num_epochs=2,
        eval_human=True,  # human replay exercises the requires_scene path too
    )

    for key in ("untrained_pdms", "trained_pdms", "human_replay_pdms", "margin"):
        assert np.isfinite(results[key]), key
    assert 0.0 <= results["untrained_pdms"] <= 1.0
    assert 0.0 <= results["trained_pdms"] <= 1.0
    # human replay of a clean constant-speed drive on an empty straight road
    # scores high through the full cache+sim+score pipeline
    assert results["human_replay_pdms"] > 0.75, results

    on_disk = json.loads((tmp_path / "cap" / "capability_loop.json").read_text())
    assert on_disk["num_holdout_tokens"] == 6
    assert (tmp_path / "cap" / "train" / "epoch_0001").exists()
