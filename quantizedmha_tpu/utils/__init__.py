"""Host utilities: checkpoint/resume and metrics (SURVEY.md §5 subsystems
the reference lacked entirely)."""

from quantizedmha_tpu.utils.checkpoint import CheckpointManager
from quantizedmha_tpu.utils.metrics import Metrics, default_metrics

__all__ = ["CheckpointManager", "Metrics", "default_metrics"]
