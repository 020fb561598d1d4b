"""Create a submission pickle of {token: Trajectory} + team metadata.

Parity: `navsim/planning/script/run_create_submission_pickle.py:23-98`.
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle
import traceback
from pathlib import Path
from typing import Dict

from diffusiondrive_tpu.common.dataclasses import Trajectory
from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.config.registry import agent_from_config, load_split, scene_filter_from_split
from diffusiondrive_tpu.script.cli_common import add_common_args, resolve_run_config, snapshot_config

logger = logging.getLogger(__name__)


def run_test_evaluation(agent, scene_loader) -> Dict[str, Trajectory]:
    """Per-token trajectory computation with failure quarantine."""
    if agent.requires_scene:
        assert False, "Submission agents cannot require privileged scenes."
    agent.initialize()
    output: Dict[str, Trajectory] = {}
    for idx, token in enumerate(scene_loader.tokens):
        try:
            agent_input = scene_loader.get_agent_input_from_token(token)
            output[token] = agent.compute_trajectory(agent_input)
        except Exception:
            logger.error("Token %s failed:\n%s", token, traceback.format_exc())
    return output


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser, default_agent="diffusiondrive_agent")
    parser.add_argument("--team-name", default=None)
    parser.add_argument("--authors", default=None)
    parser.add_argument("--email", default=None)
    parser.add_argument("--institution", default=None)
    parser.add_argument("--country", default=None)
    args = parser.parse_args()

    cfg = resolve_run_config(args)
    for field in ("team_name", "authors", "email", "institution", "country"):
        if getattr(args, field, None):
            cfg[field] = getattr(args, field)
        if not cfg.get(field):
            parser.error(f"--{field.replace('_', '-')} (or {field} in --config) is required")
    snapshot_config(cfg, Path(cfg["output_dir"]))

    agent = agent_from_config(cfg["agent"])
    split = load_split(cfg.get("split"))
    scene_loader = SceneLoader(
        Path(cfg["navsim_log_path"]),
        Path(cfg["sensor_blobs_path"]) if cfg.get("sensor_blobs_path") else None,
        scene_filter_from_split(split),
        agent.get_sensor_config(),
        build_map_api=False,
    )
    predictions = run_test_evaluation(agent, scene_loader)
    submission = {
        "team_name": cfg["team_name"],
        "authors": cfg["authors"],
        "email": cfg["email"],
        "institution": cfg["institution"],
        "country": cfg["country"],
        "predictions": [predictions],
    }
    out = Path(cfg["output_dir"])
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "submission.pkl", "wb") as fp:
        pickle.dump(submission, fp)
    logger.info("Wrote %d predictions to %s", len(predictions), out / "submission.pkl")


if __name__ == "__main__":
    main()
