"""Serialized-artifact export: the SavedModel / ONNX analog.

The reference ships two serving-export paths: TFHub SavedModel at a fixed
246000-sample shape (`/root/reference/src/export2hub.py`) and ONNX
(`notebooks/wav2vec2_onnx.ipynb`).  The JAX-native equivalent is
`jax.export`: the jitted forward is lowered once to a versioned StableHLO
artifact that any later process (or another framework via PJRT) can load
and execute without the Python model code — same role, same fixed-shape
contract, compiler-portable.

SpecAugment/dropout are inactive (inference trace), mirroring
`export2hub.py:63-69`'s `apply_spec_augment=False`.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..models.config import Wav2Vec2Config
from ..models.modeling import wav2vec2_for_ctc_forward, wav2vec2_forward

ARTIFACT_NAME = "model.stablehlo"
META_NAME = "export_meta.json"


def export_model(
    config: Wav2Vec2Config,
    params,
    save_dir: str,
    *,
    seqlen: int = 246000,
    batch_size: Optional[int] = None,
    with_lm_head: bool = True,
    with_attention_mask: Optional[bool] = None,
    compute_dtype=jnp.bfloat16,
) -> str:
    """Serialize the forward pass at a fixed shape.

    `batch_size=None` exports with a symbolic batch dimension (any batch at
    runtime, one compile per concrete batch) — strictly more useful than the
    reference's fully-fixed SavedModel.  Robust models take a
    `(speech, attention_mask)` pair, as in `export2hub.py:40-57`.
    """
    if with_attention_mask is None:
        with_attention_mask = config.is_robust
    fwd = wav2vec2_for_ctc_forward if with_lm_head else wav2vec2_forward

    def fn(params, speech, attention_mask=None):
        return fwd(
            params, config, speech, attention_mask,
            training=False, compute_dtype=compute_dtype,
        )

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size
    speech_spec = jax.ShapeDtypeStruct((b, seqlen), jnp.float32)
    args = (params, speech_spec)
    if with_attention_mask:
        args = args + (jax.ShapeDtypeStruct((b, seqlen), jnp.float32),)

    exported = jax_export.export(jax.jit(fn))(*args)
    blob = exported.serialize()

    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, ARTIFACT_NAME), "wb") as f:
        f.write(blob)
    with open(os.path.join(save_dir, META_NAME), "w") as f:
        json.dump(
            {
                "seqlen": seqlen,
                "batch_size": batch_size,
                "with_lm_head": with_lm_head,
                "with_attention_mask": with_attention_mask,
                "compute_dtype": jnp.dtype(compute_dtype).name,
                "vocab_size": config.vocab_size,
            },
            f,
        )
    config.save_pretrained(save_dir)
    return os.path.join(save_dir, ARTIFACT_NAME)


def load_exported(save_dir: str) -> Tuple["jax_export.Exported", dict]:
    """Load a serialized artifact; returns (exported, meta).

    `exported.call(params, speech[, mask])` runs it under jit.
    """
    with open(os.path.join(save_dir, ARTIFACT_NAME), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(save_dir, META_NAME)) as f:
        meta = json.load(f)
    return exported, meta
