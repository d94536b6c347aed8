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
]
