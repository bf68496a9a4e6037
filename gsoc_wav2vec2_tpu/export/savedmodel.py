"""TF SavedModel export via jax2tf — the literal `export2hub.py` analog.

The reference ships TFHub SavedModels at a fixed sequence length
(`/root/reference/src/export2hub.py:27-31`; robust variants take a
`(speech, attention_mask)` pair, :40-57; SpecAugment disabled, :63-69).
`export/stablehlo.py` covers the serving role natively; this module
produces the *same artifact type* the reference published, so TFHub /
TF-Serving consumers need no changes at all: the jitted forward is lowered
to StableHLO once and embedded in a TF graph (`XlaCallModule`), with the
parameters stored as TF variables in the SavedModel.

Portability: the export traces with every Pallas kernel disabled and the
XLA attention path, and lowers for both CPU and TPU
(`native_serialization_platforms`), so the artifact runs on machines with
no Mosaic support — matching the reference artifact's Colab-loadable
contract.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.config import Wav2Vec2Config
from ..models.modeling import wav2vec2_for_ctc_forward, wav2vec2_forward


def export_saved_model(
    config: Wav2Vec2Config,
    params,
    save_dir: str,
    *,
    seqlen: int = 246000,
    with_lm_head: bool = True,
    with_attention_mask: Optional[bool] = None,
    compute_dtype=jnp.float32,
    platforms=("cpu", "tpu"),
) -> str:
    """Write a TF SavedModel with a fixed-`seqlen`, any-batch signature."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    if with_attention_mask is None:
        with_attention_mask = config.is_robust
    fwd = wav2vec2_for_ctc_forward if with_lm_head else wav2vec2_forward

    # trace with the Pallas kernels off (`use_pallas=False` — an explicit
    # argument, not process-global env mutation, so a concurrent trace in
    # the same process cannot race): opaque Mosaic custom calls would pin
    # the artifact to this exact TPU toolchain
    def fn(params, speech, attention_mask=None):
        return fwd(
            params, config, speech, attention_mask,
            training=False, compute_dtype=compute_dtype,
            attention_impl="xla", use_pallas=False,
        )

    poly = [None, "b, _"] + (["b, _"] if with_attention_mask else [])
    tf_fn = jax2tf.convert(
        fn,
        with_gradient=False,
        polymorphic_shapes=poly,
        native_serialization_platforms=list(platforms),
    )

    params_np = jax.device_get(params)
    param_vars = tf.nest.map_structure(tf.Variable, params_np)

    module = tf.Module()
    module._params = param_vars  # tracked by the SavedModel

    specs = [tf.TensorSpec([None, seqlen], tf.float32, name="speech")]
    if with_attention_mask:
        specs.append(
            tf.TensorSpec([None, seqlen], tf.float32, name="attention_mask")
        )

    @tf.function(input_signature=specs, jit_compile=False, autograph=False)
    def serving(speech, attention_mask=None):
        if with_attention_mask:
            return tf_fn(param_vars, speech, attention_mask)
        return tf_fn(param_vars, speech)

    module.__call__ = serving
    tf.saved_model.save(
        module, save_dir,
        signatures={"serving_default": serving},
    )
    return save_dir
