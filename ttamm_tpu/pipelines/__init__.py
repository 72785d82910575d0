from .training import (
    EarlyStoppingController,
    TrainingHistory,
    TrainingResult,
    extract_metric_value,
    run_single_experiment,
    run_training,
)

__all__ = [
    "EarlyStoppingController",
    "TrainingHistory",
    "TrainingResult",
    "extract_metric_value",
    "run_single_experiment",
    "run_training",
]
