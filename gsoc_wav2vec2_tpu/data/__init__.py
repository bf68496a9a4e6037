from .loaders import (
    CommonDataLoader,
    LibriSpeechDataLoader,
    LibriSpeechDataLoaderArgs,
    TimitDataLoader,
    TimitDataLoaderArgs,
    find_files,
)
from .processor import Wav2Vec2Processor

__all__ = [
    "Wav2Vec2Processor",
    "CommonDataLoader",
    "LibriSpeechDataLoader",
    "LibriSpeechDataLoaderArgs",
    "TimitDataLoader",
    "TimitDataLoaderArgs",
    "find_files",
]
