from .logging import MetricLogger
from .metrics import cer, edit_distance, wer

__all__ = ["MetricLogger", "wer", "cer", "edit_distance"]
