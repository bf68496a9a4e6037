"""CLI: convert an HF PyTorch (or reference TF H5) checkpoint to JAX.

Equivalent of the reference's `src/convert_torch_to_tf.py` CLI (same
`--model_id / --with_lm_head` flags); the output directory loads through
`Wav2Vec2ForCTC.from_pretrained` and `save_pretrained`s as
config.json + jax_model.msgpack.

Also accepts HuBERT checkpoints (model_type auto-detected, e.g.
facebook/hubert-large-ls960-ft) — a model family the reference never
supported; they share the backbone and run through every surface here.

Usage:
    python -m gsoc_wav2vec2_tpu.cli.convert \
        --model_id facebook/wav2vec2-base-960h [--out jax-wav2vec2-base-960h]
"""

from __future__ import annotations

import argparse
import os

from ..models.config import RobustWav2Vec2Config
from ..models.modeling import Wav2Vec2ForCTC, Wav2Vec2Model


def convert(model_id: str, out_dir: str, with_lm_head: bool = True,
            robust: bool = False, verify: bool = True) -> str:
    import transformers

    # HuBERT checkpoints (facebook/hubert-large-ls960-ft etc.) ride the same
    # backbone: architecturally wav2vec2 minus the pretraining quantizer,
    # plus the `feat_proj_layer_norm` knob — detected from the HF config
    hf_cfg = transformers.AutoConfig.from_pretrained(model_id)
    if hf_cfg.model_type == "hubert":
        hf_cls = (
            transformers.HubertForCTC if with_lm_head else transformers.HubertModel
        )
    else:
        hf_cls = (
            transformers.Wav2Vec2ForCTC if with_lm_head
            else transformers.Wav2Vec2Model
        )
    hf_model = hf_cls.from_pretrained(model_id).eval()

    from ..models.config import config_from_hf_dict

    config = config_from_hf_dict(hf_model.config.to_dict())
    if robust and not config.is_robust:
        # escape hatch: mark a checkpoint mask-aware without changing the
        # HF-derived norm types (the reference's robust flag analog)
        config = RobustWav2Vec2Config(**{**config.__dict__, "is_robust": True})

    from ..convert.torch_to_jax import params_from_hf_model

    params = params_from_hf_model(hf_model, config, with_lm_head=with_lm_head)
    cls = Wav2Vec2ForCTC if with_lm_head else Wav2Vec2Model
    model = cls(config, params=params)

    if verify:
        import numpy as np
        import torch

        speech = np.random.RandomState(0).randn(1, 8000).astype(np.float32)
        with torch.no_grad():
            hf_out = hf_model(torch.from_numpy(speech))
            expected = (hf_out.logits if with_lm_head else hf_out.last_hidden_state).numpy()
        got = np.asarray(model(speech))
        atol = float(np.abs(got - expected).max())
        print(f"conversion max abs diff vs torch: {atol:.2e}")
        assert atol < 0.004, "conversion parity check failed (atol 0.004)"

    model.save_pretrained(out_dir)
    print(f"saved to {out_dir}")
    return out_dir


def main() -> None:
    parser = argparse.ArgumentParser("Convert HF torch wav2vec2 to JAX")
    parser.add_argument("--model_id", required=True, type=str)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--with_lm_head", action=argparse.BooleanOptionalAction,
                        default=True)
    parser.add_argument("--robust", action="store_true")
    parser.add_argument("--no-verify", dest="verify", action="store_false")
    args = parser.parse_args()
    out = args.out or f"jax-{os.path.basename(args.model_id)}"
    convert(args.model_id, out, args.with_lm_head, args.robust, args.verify)


if __name__ == "__main__":
    main()
