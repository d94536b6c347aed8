from .threshold import (
    ThresholdMetrics,
    best_threshold_metrics,
    threshold_metrics,
)
from .reconstruction import reconstruction_metrics
from .metrics import (
    LevelMetrics,
    confusion_matrix,
    hierarchical_match_counts,
    level_metrics_from_confusion,
    multilevel_metrics,
)
from .multilabel import (
    multilabel_metrics,
    per_class_pr,
    tune_per_class_thresholds,
    tune_single_threshold,
)
from .ranking import joint_classification_metrics
from .reports import Summarize
from .confusion import cross_level_confusion

__all__ = [
    "ThresholdMetrics",
    "best_threshold_metrics",
    "threshold_metrics",
    "reconstruction_metrics",
    "LevelMetrics",
    "confusion_matrix",
    "hierarchical_match_counts",
    "level_metrics_from_confusion",
    "multilevel_metrics",
    "multilabel_metrics",
    "per_class_pr",
    "tune_per_class_thresholds",
    "tune_single_threshold",
    "joint_classification_metrics",
    "Summarize",
    "cross_level_confusion",
]
