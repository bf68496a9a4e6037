from .devices import is_gpu_available, is_tpu_available
from .logging import MetricLogger
from .metrics import cer, edit_distance, wer

__all__ = [
    "MetricLogger",
    "wer",
    "cer",
    "edit_distance",
    "is_tpu_available",
    "is_gpu_available",
]
