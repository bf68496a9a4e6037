"""TPU-native JAX re-implementation of the gsoc-wav2vec2 framework.

Public surface mirrors the reference package
(`/root/reference/src/wav2vec2/__init__.py:1-4`):
`Wav2Vec2Config`, `RobustWav2Vec2Config`, `CTCLoss`, `Wav2Vec2ForCTC`,
`Wav2Vec2Model`, `Wav2Vec2Processor`.
"""

from .data.processor import Wav2Vec2Processor
from .models.config import (
    RobustWav2Vec2Config,
    RobustWav2Vec2PretrainingConfig,
    Wav2Vec2Config,
    Wav2Vec2PretrainingConfig,
)
from .models.modeling import Wav2Vec2ForCTC, Wav2Vec2Model
from .ops.ctc import CTCLoss

__version__ = "0.1.0"

__all__ = [
    "Wav2Vec2Config",
    "RobustWav2Vec2Config",
    "Wav2Vec2PretrainingConfig",
    "RobustWav2Vec2PretrainingConfig",
    "CTCLoss",
    "Wav2Vec2ForCTC",
    "Wav2Vec2Model",
    "Wav2Vec2Processor",
]
