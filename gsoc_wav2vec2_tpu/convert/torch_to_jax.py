"""HuggingFace PyTorch → JAX checkpoint converter.

The reference converts HF torch weights to TF variables by name rewriting +
transposes (`/root/reference/src/convert_torch_to_tf.py:13-35,110-117`).
This module implements the same weight-naming contract directly against the
JAX parameter tree:

  * 2-D `weight` matrices transpose (out, in) -> (in, out) ("kernel");
  * 3-D conv weights transpose (out, in, K) -> (K, in, out);
  * the pos-conv weight-norm pair keeps its (g, v) decomposition, with the
    same (2, 1, 0) transpose (g: (1,1,K) -> (K,1,1));
  * `layer_norm.weight/bias` -> `gamma`/`beta`.

Handles both the legacy `weight_g`/`weight_v` naming and the modern torch
`parametrizations.weight.original0/original1` naming.  Accepts the
`wav2vec2.` AND `hubert.` backbone prefixes — HuBERT checkpoints
(HubertForCTC) are architecturally wav2vec2 minus the pretraining
quantizer, modulo the optional feature-projection LayerNorm
(`feat_proj_layer_norm`) and a possibly-absent `masked_spec_embed`.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _normalize_torch_keys(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        k = k.replace("parametrizations.weight.original0", "weight_g")
        k = k.replace("parametrizations.weight.original1", "weight_v")
        out[k] = np.asarray(v)
    return out


def _ln(sd, prefix: str) -> dict:
    return {
        "gamma": jnp.asarray(sd[f"{prefix}.weight"]),
        "beta": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _dense(sd, prefix: str) -> dict:
    return {
        "kernel": jnp.asarray(sd[f"{prefix}.weight"].T),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def params_from_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    config,
    with_lm_head: bool = True,
) -> dict:
    """Build the full JAX parameter tree from an HF torch state dict.

    `state_dict` keys follow `transformers` Wav2Vec2Model/Wav2Vec2ForCTC
    naming.  Encoder layers are stacked along a leading axis for `lax.scan`.
    """
    sd = _normalize_torch_keys(state_dict)
    # backbone prefix: `wav2vec2.` under Wav2Vec2ForCTC, `hubert.` under
    # HubertForCTC (same layer layout — HuBERT is architecturally wav2vec2
    # minus the quantizer), empty for bare backbone checkpoints
    prefix = ""
    for cand in ("wav2vec2.", "hubert."):
        if any(k.startswith(cand) for k in sd):
            prefix = cand
            break

    def g(key):
        return sd[prefix + key]

    # feature extractor -----------------------------------------------------
    conv_layers = []
    for i in range(len(config.filter_sizes)):
        base = f"feature_extractor.conv_layers.{i}"
        p = {
            "conv": {
                "kernel": jnp.asarray(g(f"{base}.conv.weight").transpose(2, 1, 0))
            }
        }
        if prefix + f"{base}.conv.bias" in sd:
            p["conv"]["bias"] = jnp.asarray(g(f"{base}.conv.bias"))
        if prefix + f"{base}.layer_norm.weight" in sd:
            p["layer_norm"] = {
                "gamma": jnp.asarray(g(f"{base}.layer_norm.weight")),
                "beta": jnp.asarray(g(f"{base}.layer_norm.bias")),
            }
        conv_layers.append(p)

    # encoder layers (stacked) ----------------------------------------------
    per_layer = []
    for i in range(config.num_layers):
        base = f"{prefix}encoder.layers.{i}"
        per_layer.append(
            {
                "attention": {
                    name: _dense(sd, f"{base}.attention.{name}")
                    for name in ("q_proj", "k_proj", "v_proj", "out_proj")
                },
                "layer_norm": _ln(sd, f"{base}.layer_norm"),
                "feed_forward": {
                    "intermediate_dense": _dense(
                        sd, f"{base}.feed_forward.intermediate_dense"
                    ),
                    "output_dense": _dense(sd, f"{base}.feed_forward.output_dense"),
                },
                "final_layer_norm": _ln(sd, f"{base}.final_layer_norm"),
            }
        )
    import jax

    layers = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)

    feature_projection = {
        "projection": _dense(sd, f"{prefix}feature_projection.projection"),
    }
    if prefix + "feature_projection.layer_norm.weight" in sd:
        # absent when HF `feat_proj_layer_norm=False` (HuBERT-family knob)
        feature_projection["layer_norm"] = _ln(
            sd, f"{prefix}feature_projection.layer_norm"
        )

    model_params = {
        # inference-only checkpoints (mask probs 0) may omit the mask
        # embedding; it is only read under SpecAugment, so zeros are inert
        "masked_spec_embed": (
            jnp.asarray(g("masked_spec_embed"))
            if prefix + "masked_spec_embed" in sd
            else jnp.zeros((config.hidden_size,), jnp.float32)
        ),
        "feature_extractor": {"conv_layers": tuple(conv_layers)},
        "feature_projection": feature_projection,
        "encoder": {
            "pos_conv_embed": {
                "conv": {
                    # (out, in/g, K) -> (K, in/g, out); g (1,1,K) -> (K,1,1)
                    # matching reference `convert_torch_to_tf.py:114-115`
                    "weight_v": jnp.asarray(
                        g("encoder.pos_conv_embed.conv.weight_v").transpose(2, 1, 0)
                    ),
                    "weight_g": jnp.asarray(
                        g("encoder.pos_conv_embed.conv.weight_g").transpose(2, 1, 0)
                    ),
                    "bias": jnp.asarray(g("encoder.pos_conv_embed.conv.bias")),
                }
            },
            "layer_norm": _ln(sd, f"{prefix}encoder.layer_norm"),
            "layers": layers,
        },
    }

    if with_lm_head:
        return {"wav2vec2": model_params, "lm_head": _dense(sd, "lm_head")}
    return model_params


def params_from_hf_model(hf_model, config, with_lm_head: bool = True) -> dict:
    """Convert a live `transformers` PyTorch model."""
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}
    return params_from_torch_state_dict(sd, config, with_lm_head=with_lm_head)


def pretraining_params_from_torch_state_dict(
    state_dict: Dict[str, np.ndarray], config
) -> dict:
    """`transformers.Wav2Vec2ForPreTraining` checkpoint → JAX pretraining tree.

    Backbone reuses `params_from_torch_state_dict`; the quantizer keeps the
    HF layout (codevectors (1, G·V, d/G), weight_proj (in, out) after the
    usual 2-D transpose).  This is how facebook/wav2vec2-base-style
    checkpoints enter `models/pretraining.py`.
    """
    sd = _normalize_torch_keys(state_dict)
    return {
        "wav2vec2": params_from_torch_state_dict(sd, config, with_lm_head=False),
        "quantizer": {
            "codevectors": jnp.asarray(sd["quantizer.codevectors"]),
            "weight_proj": _dense(sd, "quantizer.weight_proj"),
        },
        "project_hid": _dense(sd, "project_hid"),
        "project_q": _dense(sd, "project_q"),
    }


def pretraining_params_from_hf_model(hf_model, config) -> dict:
    """Convert a live `transformers.Wav2Vec2ForPreTraining` model."""
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}
    return pretraining_params_from_torch_state_dict(sd, config)


def load_torch_file_params(path: str, template_params, config, with_lm_head=True):
    """Load a `pytorch_model.bin` / `model.safetensors` file."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {
            k: v.numpy()
            for k, v in torch.load(path, map_location="cpu", weights_only=True).items()
        }
    return params_from_torch_state_dict(sd, config, with_lm_head=with_lm_head)
