"""CLI: average training checkpoints into a servable model.

Tail averaging (Polyak-style) of the last N epoch checkpoints is a
standard ~0.1-0.3 WER booster for CTC models.  The reference retains
per-epoch weight files (`/root/reference/src/training_utils.py:38-45`)
but has no tool to combine them; here the Orbax training checkpoints
written by `cli.train` (`<ckpt_dir>/stage2`) can be averaged directly
into a `save_pretrained` directory that every decode surface
(`cli.evaluate`, `cli.transcribe`, `cli.serve`) accepts.

Usage:
    python -m gsoc_wav2vec2_tpu.cli.average \
        --ckpt_dir ckpts/stage2 --config trained_model/ \
        --last_n 5 --out averaged_model/
"""

from __future__ import annotations

import argparse
import os

from ..models.config import Wav2Vec2Config
from ..models.modeling import Wav2Vec2ForCTC
from ..training.checkpoint import average_checkpoint_params


def main() -> None:
    parser = argparse.ArgumentParser("checkpoint averaging")
    parser.add_argument(
        "--ckpt_dir", required=True,
        help="Orbax checkpoint dir (e.g. <train ckpt_dir>/stage2)",
    )
    parser.add_argument(
        "--config", required=True,
        help="config.json path, or a model dir containing one",
    )
    parser.add_argument("--out", required=True, help="output model dir")
    group = parser.add_mutually_exclusive_group()
    group.add_argument(
        "--last_n", type=int, default=None,
        help="average the newest N checkpoints (default: all retained)",
    )
    group.add_argument(
        "--steps", type=str, default=None,
        help="comma-separated checkpoint steps to average",
    )
    args = parser.parse_args()

    config_path = args.config
    if os.path.isdir(config_path):
        config_path = os.path.join(config_path, "config.json")
    config = Wav2Vec2Config.from_json(config_path)

    steps = (
        [int(s) for s in args.steps.split(",") if s]
        if args.steps is not None
        else None
    )
    params, used = average_checkpoint_params(
        args.ckpt_dir, steps=steps, last_n=args.last_n
    )
    print(f"averaged {len(used)} checkpoints: steps {used}")
    Wav2Vec2ForCTC(config, params=params).save_pretrained(args.out)
    print(f"saved averaged model to {args.out}")


if __name__ == "__main__":
    main()
