"""CLI: export a checkpoint for serving.

Equivalent of the reference's `src/export2hub.py` (fixed-seqlen SavedModel
for TFHub), with the same flags.  Three formats:
  * `--format stablehlo` (default): portable `jax.export` artifact with a
    symbolic batch dimension (`export/stablehlo.py`);
  * `--format saved_model`: a literal TF SavedModel via jax2tf
    (`export/savedmodel.py`) — what the reference published to TFHub;
  * `--format onnx`: a literal `.onnx` ModelProto built op-by-op and
    serialized by the from-scratch protobuf codec (`export/onnx_export.py`)
    — the `notebooks/wav2vec2_onnx.ipynb` artifact, float32 semantics.

Usage:
    python -m gsoc_wav2vec2_tpu.cli.export \
        --model_id <dir-or-hub-id> --saved_model_dir out/ --seqlen 246000
"""

from __future__ import annotations

import argparse

from ..export.stablehlo import export_model
from ..models.modeling import Wav2Vec2ForCTC, Wav2Vec2Model


def main() -> None:
    parser = argparse.ArgumentParser("Export wav2vec2 to a StableHLO artifact")
    parser.add_argument("--model_id", required=True, type=str)
    parser.add_argument("--saved_model_dir", required=True, type=str)
    parser.add_argument("--seqlen", type=int, default=246000)
    parser.add_argument("--batch_size", type=int, default=0,
                        help="0 = symbolic (any batch)")
    parser.add_argument("--with_lm_head", action=argparse.BooleanOptionalAction,
                        default=True)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    parser.add_argument("--format", type=str, default="stablehlo",
                        choices=["stablehlo", "saved_model", "onnx"])
    args = parser.parse_args()

    cls = Wav2Vec2ForCTC if args.with_lm_head else Wav2Vec2Model
    model = cls.from_pretrained(args.model_id)
    import jax.numpy as jnp

    if args.format == "onnx":
        from ..export.onnx_export import export_onnx

        path = export_onnx(
            model.config,
            model.params,
            args.saved_model_dir,
            seqlen=args.seqlen,
            with_lm_head=args.with_lm_head,
        )
    elif args.format == "saved_model":
        from ..export.savedmodel import export_saved_model

        path = export_saved_model(
            model.config,
            model.params,
            args.saved_model_dir,
            seqlen=args.seqlen,
            with_lm_head=args.with_lm_head,
            compute_dtype=getattr(jnp, args.compute_dtype),
        )
    else:
        path = export_model(
            model.config,
            model.params,
            args.saved_model_dir,
            seqlen=args.seqlen,
            batch_size=args.batch_size or None,
            with_lm_head=args.with_lm_head,
            compute_dtype=getattr(jnp, args.compute_dtype),
        )
    print(f"exported to {path}")


if __name__ == "__main__":
    main()
