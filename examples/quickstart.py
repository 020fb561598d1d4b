"""Quickstart: synthetic scene -> planner -> PDMS score -> visualization.

Runs with no datasets (a synthetic straight-road scene is built in-process);
swap in real OpenScene paths for actual data. Mirrors the reference's
tutorial notebook flow (`tutorial/tutorial_visualization.ipynb`).

    python -m examples.quickstart [--out /tmp/dd_quickstart]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="/tmp/dd_quickstart")
    args = parser.parse_args()
    out = Path(args.out)

    from diffusiondrive_tpu.utils.synthetic import build_synthetic_log, make_straight_map

    from diffusiondrive_tpu.agents.constant_velocity_agent import ConstantVelocityAgent
    from diffusiondrive_tpu.common.dataclasses import SceneFilter, SensorConfig
    from diffusiondrive_tpu.common.dataloader import MetricCacheLoader, SceneLoader
    from diffusiondrive_tpu.evaluate.runner import run_pdm_score_evaluation, write_score_csv
    from diffusiondrive_tpu.planning.metric_caching import MetricCacheProcessor
    from diffusiondrive_tpu.visualization import frame_plot_to_gif, plot_bev_frame

    logs_dir, blobs_dir = build_synthetic_log(out / "data", with_sensor_blobs=True)
    map_api = make_straight_map()

    loader = SceneLoader(logs_dir, blobs_dir, SceneFilter(), SensorConfig.build_no_sensors(),
                         build_map_api=False)
    print(f"{len(loader)} scenes: {loader.tokens}")

    # 1. metric caching (PDM-Closed runs per scene)
    processor = MetricCacheProcessor(str(out / "metric_cache"))
    for token in loader.tokens:
        scene = loader.get_scene_from_token(token)
        processor.compute_metric_cache(scene, map_api)
    print("metric caches written")

    # 2. batched PDMS evaluation of the constant-velocity baseline
    rows = run_pdm_score_evaluation(
        ConstantVelocityAgent(), loader, MetricCacheLoader(out / "metric_cache"), batch_size=8
    )
    csv = write_score_csv(rows, out / "eval")
    print(f"scores -> {csv}")
    for row in rows:
        print(f"  {row['token']}: PDMS={row['score']:.3f}")

    # 3. visualization
    scene = loader.get_scene_from_token(loader.tokens[0])
    scene.map_api = map_api
    frame_plot_to_gif(str(out / "scene.gif"), plot_bev_frame, scene)
    print(f"gif -> {out / 'scene.gif'}")


if __name__ == "__main__":
    main()
