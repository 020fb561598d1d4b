"""Merge several submission pickles into one.

Parity: `navsim/planning/script/run_merge_submission_pickles.py:21`.
"""

from __future__ import annotations

import argparse
import logging
import pickle


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("inputs", nargs="+", help="submission pickles to merge")
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    merged = None
    predictions = {}
    for path in args.inputs:
        with open(path, "rb") as fp:
            sub = pickle.load(fp)
        if merged is None:
            merged = {k: v for k, v in sub.items() if k != "predictions"}
        for pred in sub["predictions"]:
            predictions.update(pred)
    merged["predictions"] = [predictions]
    with open(args.output, "wb") as fp:
        pickle.dump(merged, fp)
    logging.info("Merged %d pickles -> %d predictions at %s", len(args.inputs), len(predictions), args.output)


if __name__ == "__main__":
    main()
