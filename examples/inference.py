#!/usr/bin/env python
"""Transcribe audio files through the library API.

The runnable analog of the reference's `wav2vec2-inference.ipynb`
(`/root/reference/notebooks/wav2vec2-inference.ipynb`: wav/flac →
processor → model → argmax → decode).  For long-form audio (chunked
windows) use `python -m gsoc_wav2vec2_tpu.cli.transcribe` instead.

Usage (from the repo root):
    python examples/inference.py --model_dir path/to/model clip.flac ...
"""

import argparse

import numpy as np

from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC, Wav2Vec2Processor
from gsoc_wav2vec2_tpu.data.native_io import read_sound


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--model_dir", required=True,
        help="local dir, gs:// URL, or HF hub id (msgpack, tf_model.h5, "
             "or HF torch weights)",
    )
    parser.add_argument("files", nargs="+", help=".wav / .flac files")
    args = parser.parse_args()

    model = Wav2Vec2ForCTC.from_pretrained(args.model_dir)
    processor = Wav2Vec2Processor(is_tokenizer=False)
    tokenizer = Wav2Vec2Processor(is_tokenizer=True)

    for path in args.files:
        audio, sample_rate = read_sound(path)  # native C++ decoder, no deps
        if sample_rate != 16000:
            raise ValueError(f"{path}: expected 16 kHz audio, got {sample_rate}")
        speech = np.asarray(processor(audio), np.float32)
        logits = model(speech[None, :])  # jitted forward
        text = tokenizer.decode(np.asarray(logits).argmax(-1)[0])
        print(f"{path}: {text}")


if __name__ == "__main__":
    main()
