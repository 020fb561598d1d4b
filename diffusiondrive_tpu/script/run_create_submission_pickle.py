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

from diffusiondrive_tpu.common.dataclasses import SceneFilter, Trajectory
from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.config.registry import build_agent, load_split, load_yaml

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
    parser.add_argument("--agent", default="diffusiondrive_agent")
    parser.add_argument("--agent-config", default=None)
    parser.add_argument("--navsim-log-path", default=os.environ.get("OPENSCENE_DATA_ROOT"))
    parser.add_argument("--sensor-blobs-path", default=os.environ.get("OPENSCENE_SENSOR_ROOT"))
    parser.add_argument("--split", default=None)
    parser.add_argument("--output-dir", default=os.environ.get("NAVSIM_EXP_ROOT", "exp"))
    parser.add_argument("--team-name", required=True)
    parser.add_argument("--authors", required=True)
    parser.add_argument("--email", required=True)
    parser.add_argument("--institution", required=True)
    parser.add_argument("--country", required=True)
    args = parser.parse_args()

    agent = build_agent(args.agent, **load_yaml(args.agent_config))
    split = load_split(args.split)
    scene_loader = SceneLoader(
        Path(args.navsim_log_path),
        Path(args.sensor_blobs_path) if args.sensor_blobs_path else None,
        SceneFilter(log_names=split["log_names"], tokens=split["tokens"]),
        agent.get_sensor_config(),
        build_map_api=False,
    )
    predictions = run_test_evaluation(agent, scene_loader)
    submission = {
        "team_name": args.team_name,
        "authors": args.authors,
        "email": args.email,
        "institution": args.institution,
        "country": args.country,
        "predictions": [predictions],
    }
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "submission.pkl", "wb") as fp:
        pickle.dump(submission, fp)
    logger.info("Wrote %d predictions to %s", len(predictions), out / "submission.pkl")


if __name__ == "__main__":
    main()
