"""Evaluation package. Exports are lazy: `common.dataloader` imports
`evaluate.metric_cache`, so eager re-exports here would create an import
cycle through `evaluate.runner`."""

_EXPORTS = {
    "MetricCache": "diffusiondrive_tpu.evaluate.metric_cache",
    "pdm_score": "diffusiondrive_tpu.evaluate.pdm_score",
    "batched_pdm_score": "diffusiondrive_tpu.evaluate.pdm_score",
    "run_pdm_score_evaluation": "diffusiondrive_tpu.evaluate.runner",
    "write_score_csv": "diffusiondrive_tpu.evaluate.runner",
    "PDMScorerConfig": "diffusiondrive_tpu.evaluate.scorer",
    "ScorerOutput": "diffusiondrive_tpu.evaluate.scorer",
    "score_proposals": "diffusiondrive_tpu.evaluate.scorer",
    "PDMSimulator": "diffusiondrive_tpu.evaluate.simulator",
    "VehicleParameters": "diffusiondrive_tpu.evaluate.vehicle",
    "get_pacifica_parameters": "diffusiondrive_tpu.evaluate.vehicle",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'diffusiondrive_tpu.evaluate' has no attribute '{name}'")
