"""Score a submission pickle against the metric cache (no agent).

Parity: `navsim/planning/script/run_pdm_score_from_submission.py:29-113`.
"""

from __future__ import annotations

import argparse
import json
import logging
import pickle
from pathlib import Path

import numpy as np

from diffusiondrive_tpu.common.dataclasses import TrajectorySampling
from diffusiondrive_tpu.common.dataloader import MetricCacheLoader
from diffusiondrive_tpu.evaluate.pdm_score import batched_pdm_score
from diffusiondrive_tpu.evaluate.runner import SUB_SCORE_COLUMNS, _result_to_row, write_score_csv
from diffusiondrive_tpu.evaluate.simulator import PDMSimulator

logger = logging.getLogger(__name__)


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--submission", required=True)
    parser.add_argument("--metric-cache-path", required=True)
    parser.add_argument("--output-dir", default="exp")
    parser.add_argument("--batch-size", type=int, default=64)
    args = parser.parse_args()

    with open(args.submission, "rb") as fp:
        submission = pickle.load(fp)
    predictions = submission["predictions"][0]

    cache_loader = MetricCacheLoader(Path(args.metric_cache_path))
    tokens = sorted(set(predictions) & set(cache_loader.tokens))
    logger.info("Scoring %d submitted tokens", len(tokens))

    simulator = PDMSimulator(TrajectorySampling(num_poses=40, interval_length=0.1))
    rows = []
    for start in range(0, len(tokens), args.batch_size):
        batch = tokens[start : start + args.batch_size]
        caches = [cache_loader.get_from_token(t) for t in batch]
        trajs = [predictions[t] for t in batch]
        try:
            results = batched_pdm_score(caches, trajs, simulator)
            for t, res in zip(batch, results):
                rows.append({"token": t, "valid": True, **_result_to_row(res)})
        except Exception:
            logger.exception("Batch starting at %d failed.", start)
            for t in batch:
                rows.append({"token": t, "valid": False, **{c: np.nan for c in SUB_SCORE_COLUMNS}})

    out = write_score_csv(rows, Path(args.output_dir))
    print(json.dumps({"output_csv": str(out)}))


if __name__ == "__main__":
    main()
