"""CLI: transcribe audio files (the inference-notebook analog).

Replaces the reference's `notebooks/wav2vec2-inference.ipynb` flow:
wav/flac -> normalize -> model -> argmax -> greedy-CTC decode.

Usage:
    python -m gsoc_wav2vec2_tpu.cli.transcribe --model_dir <dir> file1.wav file2.flac
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..data.native_io import read_sound
from ..data.processor import Wav2Vec2Processor
from ..evaluation import GreedyCTCEvaluator
from ..models.modeling import Wav2Vec2ForCTC


def main() -> None:
    parser = argparse.ArgumentParser("Greedy-CTC transcription")
    parser.add_argument("--model_dir", required=True, type=str)
    parser.add_argument("files", nargs="+")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument(
        "--chunk_samples", type=int, default=246000,
        help="long-form window size; audio longer than this is transcribed "
             "in overlapping chunks (the reference truncates instead)",
    )
    parser.add_argument(
        "--context_samples", type=int, default=16000,
        help="overlap context on each side of a long-form chunk",
    )
    args = parser.parse_args()

    model = Wav2Vec2ForCTC.from_pretrained(args.model_dir)
    evaluator = GreedyCTCEvaluator(model.config, model.params)
    processor = Wav2Vec2Processor(is_tokenizer=False)

    for path in args.files:
        audio, rate = read_sound(path)
        if rate != args.sample_rate:
            raise ValueError(f"{path}: sample rate {rate} != {args.sample_rate}")
        speech = np.asarray(processor(audio), np.float32)
        text = evaluator.transcribe_long(
            speech,
            chunk_samples=args.chunk_samples,
            context_samples=args.context_samples,
        )
        print(json.dumps({"file": path, "transcription": text}))


if __name__ == "__main__":
    main()
