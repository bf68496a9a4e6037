"""TPU-native JAX implementation of Wav2Vec2.

Functional core + thin object wrappers.  Parameters live in a plain nested
pytree whose key paths mirror the reference's TF variable naming contract
(`/root/reference/src/wav2vec2/modeling.py:105-255`, `encoder.py:196-295`,
`feature_extractor.py:6-106`; name templates catalogued in SURVEY.md §3.4),
which keeps the torch→JAX checkpoint converter a pure rename+transpose.

TPU-first design choices (vs. the reference's Keras graph):
  * the transformer stack is a single `lax.scan` over stacked per-layer
    parameters — one trace regardless of depth, optional rematerialisation;
  * all randomness (dropout, SpecAugment, stochastic depth) comes from
    explicit `jax.random` keys and runs on-device under `jit` (the reference
    used host `np.random` for SpecAugment, `spec_augment.py:13-14`);
  * compute dtype is a parameter (bfloat16 on the MXU for throughput,
    float32 for bit-parity testing); normalisation statistics always
    accumulate in float32;
  * no dummy-forward weight building (`modeling.py:86-102` in the
    reference) — initialisation is shape-polymorphic from the config alone.
"""

from __future__ import annotations

import functools
import logging
import os

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import mask_to_bias, mha
from ..ops.basic import dense, dropout, gelu, group_norm, layer_norm, stochastic_depth
from ..ops.conv import conv1d, init_weight_g, pos_conv_embed
from ..ops.specaugment import apply_feature_masking, apply_spec_augmentation
from .config import RobustWav2Vec2Config, Wav2Vec2Config

logger = logging.getLogger(__name__)

_glorot = jax.nn.initializers.glorot_uniform(in_axis=-2, out_axis=-1)


# ---------------------------------------------------------------------------
# Parameter initialisation
# ---------------------------------------------------------------------------


def _init_dense(rng, in_dim: int, out_dim: int) -> dict:
    return {
        "kernel": _glorot(rng, (in_dim, out_dim), jnp.float32),
        "bias": jnp.zeros((out_dim,), jnp.float32),
    }


def _init_layer_norm(dim: int) -> dict:
    return {"gamma": jnp.ones((dim,), jnp.float32), "beta": jnp.zeros((dim,), jnp.float32)}


def init_feature_extractor_params(rng, config: Wav2Vec2Config):
    """Conv front-end params (reference `feature_extractor.py:6-59`).

    Base family: GroupNorm on layer 0 only; robust family: LayerNorm on
    every layer.
    """
    layers = []
    in_dim = 1
    rngs = jax.random.split(rng, len(config.filter_sizes))
    for i, (filters, kernel) in enumerate(zip(config.filter_sizes, config.kernal_sizes)):
        p = {"conv": {"kernel": _glorot(rngs[i], (kernel, in_dim, filters), jnp.float32)}}
        if config.conv_bias:
            p["conv"]["bias"] = jnp.zeros((filters,), jnp.float32)
        if (config.feature_extractor_norm_type == "group" and i == 0) or (
            config.feature_extractor_norm_type == "layer"
        ):
            p["layer_norm"] = _init_layer_norm(filters)
        layers.append(p)
        in_dim = filters
    return tuple(layers)


def init_transformer_layer_params(rng, config: Wav2Vec2Config) -> dict:
    """One encoder layer (reference `encoder.py:68-134`)."""
    h, i_dim = config.hidden_size, config.intermediate_size
    keys = jax.random.split(rng, 6)
    return {
        "attention": {
            "q_proj": _init_dense(keys[0], h, h),
            "k_proj": _init_dense(keys[1], h, h),
            "v_proj": _init_dense(keys[2], h, h),
            "out_proj": _init_dense(keys[3], h, h),
        },
        "layer_norm": _init_layer_norm(h),
        "feed_forward": {
            "intermediate_dense": _init_dense(keys[4], h, i_dim),
            "output_dense": _init_dense(keys[5], i_dim, h),
        },
        "final_layer_norm": _init_layer_norm(h),
    }


def init_wav2vec2_params(rng, config: Wav2Vec2Config) -> dict:
    """Full `Wav2Vec2Model` parameter tree (reference `modeling.py:105-167`)."""
    k_fe, k_fp, k_pos, k_layers, k_mask = jax.random.split(rng, 5)
    h = config.hidden_size
    conv_in = config.filter_sizes[-1]

    pos_k = config.num_conv_pos_embeddings
    pos_groups = config.num_conv_pos_embedding_groups
    weight_v = _glorot(k_pos, (pos_k, h // pos_groups, h), jnp.float32)

    layer_keys = jax.random.split(k_layers, config.num_layers)
    stacked_layers = jax.vmap(lambda r: init_transformer_layer_params(r, config))(
        layer_keys
    )

    return {
        # keras "uniform" initializer == RandomUniform(-0.05, 0.05)
        # (reference `modeling.py:161-167`)
        "masked_spec_embed": jax.random.uniform(
            k_mask, (h,), jnp.float32, minval=-0.05, maxval=0.05
        ),
        "feature_extractor": {
            "conv_layers": init_feature_extractor_params(k_fe, config)
        },
        "feature_projection": (
            {
                "layer_norm": _init_layer_norm(conv_in),
                "projection": _init_dense(k_fp, conv_in, h),
            }
            if config.feat_proj_layer_norm
            else {"projection": _init_dense(k_fp, conv_in, h)}
        ),
        "encoder": {
            "pos_conv_embed": {
                "conv": {
                    "weight_v": weight_v,
                    "weight_g": init_weight_g(weight_v),
                    "bias": jnp.zeros((h,), jnp.float32),
                }
            },
            "layer_norm": _init_layer_norm(h),
            "layers": stacked_layers,
        },
    }


def init_wav2vec2_for_ctc_params(rng, config: Wav2Vec2Config) -> dict:
    """`Wav2Vec2ForCTC` = base model + LM head (reference `modeling.py:217-255`)."""
    k_model, k_head = jax.random.split(rng)
    return {
        "wav2vec2": init_wav2vec2_params(k_model, config),
        "lm_head": _init_dense(k_head, config.hidden_size, config.vocab_size),
    }


# ---------------------------------------------------------------------------
# Forward passes (pure functions)
# ---------------------------------------------------------------------------


def _rng_stream(rng: Optional[jax.Array]):
    """Sequentially derive independent keys from one root key."""
    state = {"key": rng}

    def next_key():
        if state["key"] is None:
            return None
        state["key"], sub = jax.random.split(state["key"])
        return sub

    return next_key


def feature_encoder_forward(
    params,
    config: Wav2Vec2Config,
    waveform: jax.Array,
    compute_dtype=jnp.float32,
    *,
    training: bool = False,
    frozen: bool = False,
    mesh=None,
    use_pallas: bool = True,
) -> jax.Array:
    """7× strided conv blocks over the raw waveform.

    (B, L_samples) -> (B, L_frames, 512).  Reference
    `modeling.py:188-190`, `feature_extractor.py:54-59`.

    On TPU in bf16 the first two layers run as one fused Pallas kernel
    (`ops/pallas/conv_frontend.py`): conv0's output is recomputed in
    VMEM instead of round-tripping HBM four times through
    GroupNorm/GELU/conv1.  In training the kernel needs `frozen=True`
    (stop_gradient at the front-end output — the reference recipe's state
    in both stages), since it has no VJP.
    """
    from ..ops.pallas import conv_frontend

    if frozen:
        # cut autodiff at the INPUTS: linearization is eager, so a
        # stop_gradient only on the output would still demand a JVP of the
        # (VJP-less) fused kernel; param-less operands make the whole
        # front-end a constant subgraph
        params = jax.lax.stop_gradient(params)

    start = 0
    if (
        use_pallas
        and jax.default_backend() == "tpu"
        and compute_dtype == jnp.bfloat16
        and conv_frontend.supports(config, training, frozen)
    ):
        p0, p1 = params["conv_layers"][0], params["conv_layers"][1]
        if config.feature_extractor_norm_type == "group":
            fused = functools.partial(
                conv_frontend.fused_conv01, eps=1e-5,
                gelu_approx=True,  # == ops.basic.gelu's bf16 path
            )
            args = (
                waveform,
                p0["conv"]["kernel"],
                p0["layer_norm"]["gamma"],
                p0["layer_norm"]["beta"],
                p1["conv"]["kernel"],
            )
        else:  # robust/large family: LayerNorm (+ bias) on both layers
            zeros = jnp.zeros_like(p0["layer_norm"]["gamma"])
            fused = functools.partial(
                conv_frontend.fused_conv01_robust, eps=1e-5, gelu_approx=True
            )
            args = (
                waveform,
                p0["conv"]["kernel"],
                p0["conv"].get("bias", zeros),
                p0["layer_norm"]["gamma"],
                p0["layer_norm"]["beta"],
                p1["conv"]["kernel"],
                p1["conv"].get("bias", zeros),
                p1["layer_norm"]["gamma"],
                p1["layer_norm"]["beta"],
            )
        if mesh is not None and mesh.size > 1:
            # per-shard kernel instances: GSPMD cannot partition the opaque
            # custom call (same treatment as flash attention)
            from ..parallel.mesh import shard_map_batch

            x = shard_map_batch(fused, mesh, len(args))(*args)
        else:
            x = fused(*args)
        start = 2
    else:
        x = waveform[:, :, None].astype(compute_dtype)

    for i, p in enumerate(params["conv_layers"][start:], start=start):
        x = conv1d(
            x, p["conv"]["kernel"], p["conv"].get("bias"), stride=config.strides[i]
        )
        if "layer_norm" in p:
            if config.feature_extractor_norm_type == "group":
                x = group_norm(x, p["layer_norm"], groups=config.filter_sizes[i], eps=1e-5)
            else:
                x = layer_norm(x, p["layer_norm"], eps=1e-5)
        x = gelu(x, approximate=config.is_gelu_approx)
    return x


def transformer_layer_forward(
    batch: jax.Array,
    p: dict,
    config: Wav2Vec2Config,
    mask_bias: Optional[jax.Array],
    *,
    training: bool,
    rngs: Optional[jax.Array],
    attention_impl: str = "auto",
    mesh=None,
) -> jax.Array:
    """One encoder layer, pre-/post-norm selectable (reference `encoder.py:111-134`).

    `rngs` is a stacked (4,) key array: attention-prob dropout, post-attention
    dropout, FFN dropout, stochastic depth.
    """
    deterministic = not training
    prenorm = config.attention_norm_type == "prenorm"

    residual = batch
    if prenorm:
        batch = layer_norm(batch, p["layer_norm"], config.layer_norm_eps)
    batch = mha(
        batch,
        p["attention"],
        config.num_heads,
        mask_bias,
        dropout_rate=config.dropout,
        rng=rngs[0] if training else None,
        deterministic=deterministic,
        impl=attention_impl,
        mesh=mesh,
    )
    batch = dropout(batch, config.dropout, rngs[1] if training else None, deterministic)
    batch = batch + residual
    if not prenorm:
        batch = layer_norm(batch, p["layer_norm"], config.layer_norm_eps)

    residual = batch
    if prenorm:
        batch = layer_norm(batch, p["final_layer_norm"], config.layer_norm_eps)
    batch = gelu(
        dense(batch, p["feed_forward"]["intermediate_dense"]),
        approximate=config.is_gelu_approx,
    )
    batch = dropout(batch, config.dropout, rngs[2] if training else None, deterministic)
    batch = dense(batch, p["feed_forward"]["output_dense"])
    # FFN residual goes through stochastic depth (reference `encoder.py:130`).
    batch = stochastic_depth(
        residual,
        batch,
        config.survival_prob,
        rngs[3] if training else None,
        deterministic,
    )
    if not prenorm:
        batch = layer_norm(batch, p["final_layer_norm"], config.layer_norm_eps)
    return batch


def encoder_forward(
    params,
    config: Wav2Vec2Config,
    x: jax.Array,
    frame_mask: Optional[jax.Array],
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    attention_impl: str = "auto",
    mesh=None,
    use_pallas: bool = True,
) -> jax.Array:
    """Positional conv embed + N transformer layers via `lax.scan`.

    Reference `encoder.py:251-276`.  The scan keeps compile time constant in
    depth and lets `jax.checkpoint` rematerialise per-layer activations.
    """
    next_key = _rng_stream(rng)

    mask_bias = None
    if frame_mask is not None:
        # zero out masked frames before the positional conv
        # (reference `encoder.py:253`)
        x = jnp.where(frame_mask[:, :, None], x, jnp.zeros_like(x))
        mask_bias = mask_to_bias(frame_mask, jnp.float32)

    x = x + pos_conv_embed(
        x,
        params["pos_conv_embed"]["conv"],
        config.num_conv_pos_embeddings,
        config.num_conv_pos_embedding_groups,
        config.is_gelu_approx,
        training=training,
        mesh=mesh,
        use_pallas=use_pallas,
    )

    prenorm = config.attention_norm_type == "prenorm"
    if not prenorm:
        x = layer_norm(x, params["layer_norm"], config.layer_norm_eps)
    x = dropout(x, config.dropout, next_key() if training else None, not training)

    if training:
        keys = jax.random.split(next_key(), config.num_layers * 4)
        # keep the trailing key dims (legacy uint32 keys are (n, 2))
        layer_rngs = keys.reshape((config.num_layers, 4) + keys.shape[1:])
    else:
        layer_rngs = jnp.zeros((config.num_layers, 4, 2), jnp.uint32)  # unused

    def body(h, xs):
        layer_params, layer_rng = xs
        h = transformer_layer_forward(
            h, layer_params, config, mask_bias, training=training, rngs=layer_rng,
            attention_impl=attention_impl, mesh=mesh,
        )
        return h, None

    if remat:
        # `remat` may be a policy name: "full" (save nothing per layer —
        # minimum memory, recomputes the whole layer in backward) or "dots"
        # (save MXU outputs, recompute only cheap elementwise ops — most of
        # no-remat's speed at a fraction of its activation memory)
        policy = None
        if remat == "dots":
            policy = jax.checkpoint_policies.dots_saveable
        body = jax.checkpoint(body, policy=policy)
    x, _ = jax.lax.scan(body, x, (params["layers"], layer_rngs))

    if prenorm:
        x = layer_norm(x, params["layer_norm"], config.layer_norm_eps)
    return x


def wav2vec2_forward(
    params,
    config: Wav2Vec2Config,
    batch: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
    attention_impl: str = "auto",
    mesh=None,
    frozen: tuple = (),
    use_pallas: bool = True,
) -> jax.Array:
    """`Wav2Vec2Model.call` (reference `modeling.py:169-209`).

    Args:
      batch: (B, L_samples) normalised waveform.
      attention_mask: optional (B, L_samples) 0/1 sample-level mask; converted
        to a frame-level mask through the conv stride arithmetic
        (reference `modeling.py:201-206`).
      frozen: subtree names whose parameters the optimizer freezes (the
        recipe's `trainable_mask` names).  A `stop_gradient` at the freeze
        boundary keeps XLA from building the backward program for the frozen
        region — with `optax.set_to_zero` masking those updates anyway, the
        parameter trajectory is bit-identical and the conv front-end's
        backward (the single most expensive gradient in the model) vanishes
        from the step.
    Returns:
      (B, L_frames, hidden_size) hidden states.
    """
    next_key = _rng_stream(rng)

    frontend_frozen = "feature_extractor" in frozen or "wav2vec2" in frozen
    x = feature_encoder_forward(
        params["feature_extractor"], config, batch, compute_dtype,
        training=training, frozen=frontend_frozen, mesh=mesh,
        use_pallas=use_pallas,
    )
    if frontend_frozen:
        x = jax.lax.stop_gradient(x)

    fp = params["feature_projection"]
    if config.feat_proj_layer_norm:  # always true for wav2vec2; HuBERT knob
        x = layer_norm(x, fp["layer_norm"], config.layer_norm_eps)
    x = dense(x, fp["projection"])
    x = dropout(x, config.dropout, next_key() if training else None, not training)

    if training and config.apply_spec_augment:
        x = apply_spec_augmentation(
            next_key(),
            x,
            params["masked_spec_embed"],
            config.mask_time_prob,
            config.mask_time_length,
        )
        # feature-axis masking (extension; HF `mask_feature_prob`).  The
        # key draw is inside the gate so prob=0 configs keep the exact RNG
        # stream of earlier checkpoints (bit-exact resume tests rely on it)
        if config.mask_feature_prob > 0:
            x = apply_feature_masking(
                next_key(),
                x,
                config.mask_feature_prob,
                config.mask_feature_length,
                config.mask_feature_min_masks,
            )

    frame_mask = None
    if attention_mask is not None:
        input_length = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
        frame_length = config.conv_output_length(input_length)
        frame_mask = jnp.arange(x.shape[1])[None, :] < frame_length[:, None]

    return encoder_forward(
        params["encoder"],
        config,
        x,
        frame_mask,
        training=training,
        rng=next_key() if training else None,
        remat=remat,
        attention_impl=attention_impl,
        mesh=mesh,
        use_pallas=use_pallas,
    )


def wav2vec2_for_ctc_forward(
    params,
    config: Wav2Vec2Config,
    batch: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
    attention_impl: str = "auto",
    mesh=None,
    frozen: tuple = (),
    use_pallas: bool = True,
) -> jax.Array:
    """`Wav2Vec2ForCTC.call`: base model → dropout → LM head.

    Reference `modeling.py:239-255`.  Returns (B, L_frames, vocab) logits.
    `frozen` — see `wav2vec2_forward`; "wav2vec2" stops gradients at the
    backbone output (stage 1 trains only the LM head, reference
    `main.py:210`).
    """
    next_key = _rng_stream(rng)
    head_rng = next_key() if training else None
    body_rng = next_key() if training else None
    x = wav2vec2_forward(
        params["wav2vec2"],
        config,
        batch,
        attention_mask,
        training=training,
        rng=body_rng,
        compute_dtype=compute_dtype,
        remat=remat,
        attention_impl=attention_impl,
        mesh=mesh,
        frozen=frozen,
        use_pallas=use_pallas,
    )
    if "wav2vec2" in frozen:
        x = jax.lax.stop_gradient(x)
    x = dropout(x, config.dropout, head_rng, not training)
    logits = dense(x, params["lm_head"])
    return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Object wrappers (reference public API: `from_pretrained` & friends)
# ---------------------------------------------------------------------------

JAX_WEIGHTS_NAME = "jax_model.msgpack"


class _PretrainedMixin:
    """`save_pretrained` / `from_pretrained` / `push_to_hub`.

    Mirrors the reference `TFKerasModel` hub mixin (`modeling.py:21-102`)
    with a JAX-native on-disk format (config.json + msgpack param tree) and
    transparent fallbacks that convert reference `tf_model.h5` or HF PyTorch
    checkpoints found in the same directory.
    """

    config: Wav2Vec2Config
    params: dict

    def save_pretrained(self, save_dir: str, save_h5: bool = False) -> None:
        """Write config.json + native msgpack weights; `save_h5=True` also
        writes a reference-compatible `tf_model.h5` so the reference's Keras
        `from_pretrained` can load the result directly (the switch-back
        path; reference `modeling.py:22-27`).  A `gs://`-style `save_dir`
        goes through fsspec (the multi-host trainer saves the final model
        to the checkpoint bucket)."""
        from flax import serialization

        self.config.save_pretrained(save_dir)
        blob = serialization.to_bytes(self.params)
        if "://" in save_dir:
            import fsspec

            base = save_dir.rstrip("/")
            with fsspec.open(f"{base}/{JAX_WEIGHTS_NAME}", "wb") as f:
                f.write(blob)
        else:
            with open(os.path.join(save_dir, JAX_WEIGHTS_NAME), "wb") as f:
                f.write(blob)
        if save_h5:
            import tempfile

            from ..convert.jax_to_h5 import save_h5_params

            if "://" in save_dir:
                import fsspec

                with tempfile.NamedTemporaryFile(suffix=".h5") as tmp:
                    save_h5_params(
                        self.params, self.config, tmp.name,
                        with_lm_head=self._with_lm_head,
                    )
                    with open(tmp.name, "rb") as src, fsspec.open(
                        f"{save_dir.rstrip('/')}/tf_model.h5", "wb"
                    ) as dst:
                        dst.write(src.read())
            else:
                save_h5_params(
                    self.params, self.config,
                    os.path.join(save_dir, "tf_model.h5"),
                    with_lm_head=self._with_lm_head,
                )

    def push_to_hub(self, directory: str, model_id: str):
        try:
            from huggingface_hub import HfApi
        except ImportError as e:  # pragma: no cover - hub optional
            raise ImportError("push_to_hub requires `huggingface_hub`") from e
        api = HfApi()
        api.create_repo(model_id, exist_ok=True)
        return api.upload_folder(folder_path=directory, repo_id=model_id)

    @classmethod
    def from_pretrained(cls, model_id: str, **config_kwargs):
        """Load from a local directory (or download from HF Hub when online).

        Accepts, in priority order: `jax_model.msgpack` (native),
        `tf_model.h5` (reference checkpoint format), or
        `pytorch_model.bin` / `model.safetensors` (HF PyTorch).
        Extra kwargs are `replace()`d into the config, as in the reference
        (`modeling.py:78-80`).  `input_shape` is accepted and ignored — JAX
        init is shape-polymorphic.
        """
        if "://" in model_id:
            return cls._from_remote(model_id, **config_kwargs)
        save_dir = model_id
        if not os.path.isdir(save_dir):
            save_dir = _download_from_hub(model_id)
        config_kwargs.pop("input_shape", None)

        import json as _json

        from .config import config_from_hf_dict, is_hf_config_dict

        with open(os.path.join(save_dir, "config.json")) as f:
            config_dict = _json.load(f)
        hf_snapshot = is_hf_config_dict(config_dict)
        if hf_snapshot:
            # a raw HF snapshot (e.g. facebook/wav2vec2-base-960h or
            # facebook/hubert-large-ls960-ft straight off the hub): the
            # schema translates and the torch-weights fallback below loads
            # the parameters — no separate converter run needed
            config = config_from_hf_dict(config_dict)
        else:
            config = Wav2Vec2Config(**config_dict)
            if config.is_robust:
                config = RobustWav2Vec2Config(
                    **{k: v for k, v in config.__dict__.items()}
                )
        config = config.replace(**config_kwargs)
        model = cls(config, seed=0)

        msgpack_path = os.path.join(save_dir, JAX_WEIGHTS_NAME)
        h5_path = os.path.join(save_dir, "tf_model.h5")
        pt_paths = [
            os.path.join(save_dir, n)
            for n in ("model.safetensors", "pytorch_model.bin")
        ]
        if hf_snapshot:
            # an HF repo's tf_model.h5 is the TFWav2Vec2ForCTC Keras layout,
            # NOT the reference's — only the torch weights are loadable here
            h5_path = os.path.join(save_dir, "<hf-h5-not-supported>")
        if os.path.isfile(msgpack_path):
            from flax import serialization

            with open(msgpack_path, "rb") as f:
                model.params = serialization.from_bytes(model.params, f.read())
        elif os.path.isfile(h5_path):
            from ..convert.h5_to_jax import load_h5_params

            model.params = load_h5_params(
                h5_path, model.params, with_lm_head=cls._with_lm_head
            )
        elif any(os.path.isfile(p) for p in pt_paths):
            from ..convert.torch_to_jax import load_torch_file_params

            path = next(p for p in pt_paths if os.path.isfile(p))
            model.params = load_torch_file_params(
                path, model.params, config, with_lm_head=cls._with_lm_head
            )
        else:
            raise FileNotFoundError(
                f"No weights found in {save_dir} (looked for {JAX_WEIGHTS_NAME}, "
                "tf_model.h5, model.safetensors, pytorch_model.bin)"
            )
        print(
            "Total number of loaded variables:",
            len(jax.tree_util.tree_leaves(model.params)),
        )
        return model

    @classmethod
    def _from_remote(cls, url: str, **config_kwargs):
        """Load from an object store (gs://...): config.json + native
        msgpack weights via fsspec.  The H5/torch fallbacks stay
        local-only — convert once, then serve from the bucket."""
        import fsspec
        from flax import serialization

        config_kwargs.pop("input_shape", None)
        base = url.rstrip("/")
        config = Wav2Vec2Config.from_json(f"{base}/config.json")
        if config.is_robust:
            config = RobustWav2Vec2Config(**{k: v for k, v in config.__dict__.items()})
        config = config.replace(**config_kwargs)
        model = cls(config, seed=0)
        with fsspec.open(f"{base}/{JAX_WEIGHTS_NAME}", "rb") as f:
            model.params = serialization.from_bytes(model.params, f.read())
        return model


def _download_from_hub(model_id: str) -> str:
    try:
        from huggingface_hub import snapshot_download

        # skip HF flax exports — never read here (our own msgpack is
        # `jax_model.msgpack` and reference repos' tf_model.h5 IS loadable,
        # so only the unambiguous flax file can be pruned safely)
        return snapshot_download(model_id, ignore_patterns=["flax_model*"])
    except Exception as e:
        raise ValueError(
            f"`{model_id}` is not a local directory and downloading from the "
            f"HuggingFace Hub failed ({e}). Pass a local path."
        ) from e


class Wav2Vec2Model(_PretrainedMixin):
    """Feature encoder + transformer encoder (no head).

    Reference `modeling.py:105-214`.
    """

    _with_lm_head = False
    _forward = staticmethod(wav2vec2_forward)
    _init = staticmethod(init_wav2vec2_params)

    def __init__(
        self,
        config: Wav2Vec2Config,
        seed: int = 0,
        params: Optional[dict] = None,
        compute_dtype=jnp.float32,
        remat: bool = False,
        input_shape=None,  # accepted for reference API compat; unused
    ):
        if not isinstance(config, Wav2Vec2Config):
            raise ValueError("`config` must be an instance of `Wav2Vec2Config`")
        self.config = config
        self.compute_dtype = compute_dtype
        self.remat = remat
        self.params = (
            params
            if params is not None
            else self._init(jax.random.PRNGKey(seed), config)
        )
        self._jitted = {}

    def _get_jitted(self, training: bool, has_mask: bool):
        key = (training, has_mask)
        if key not in self._jitted:
            fwd = self._forward
            cfg, cdtype, remat = self.config, self.compute_dtype, self.remat

            if has_mask:

                def fn(params, batch, attention_mask, rng=None):
                    return fwd(
                        params, cfg, batch, attention_mask,
                        training=training, rng=rng,
                        compute_dtype=cdtype, remat=remat,
                    )

            else:

                def fn(params, batch, rng=None):
                    return fwd(
                        params, cfg, batch, None,
                        training=training, rng=rng,
                        compute_dtype=cdtype, remat=remat,
                    )

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def __call__(self, batch, attention_mask=None, training: bool = False, rng=None):
        if self.config.is_robust and attention_mask is None:
            logger.warning(
                "You should pass `attention_mask` when working with Wav2Vec2 "
                "new checkpoints"
            )
        elif not self.config.is_robust and attention_mask is not None:
            logger.warning(
                "You should not pass `attention_mask` when working with "
                "checkpoints based on `wav2vec2-base`"
            )
        batch = jnp.asarray(batch)
        if training and rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        fn = self._get_jitted(training, attention_mask is not None)
        if attention_mask is not None:
            return fn(self.params, batch, jnp.asarray(attention_mask), rng)
        return fn(self.params, batch, rng)

    def freeze_feature_extractor(self):
        """Return a pytree of bools marking trainable params.

        The reference mutates Keras `trainable` flags (`modeling.py:211-214`);
        in JAX the equivalent is an optax mask, produced here.  False =
        frozen (the 7 conv layers), True = trainable.
        """
        return _trainable_mask(self.params, frozen_subtrees=("feature_extractor",))


class Wav2Vec2ForCTC(Wav2Vec2Model):
    """Wav2Vec2 model with a CTC head (reference `modeling.py:217-255`)."""

    _with_lm_head = True
    _forward = staticmethod(wav2vec2_for_ctc_forward)
    _init = staticmethod(init_wav2vec2_for_ctc_params)

    def freeze_feature_extractor(self):
        return _trainable_mask(self.params, frozen_subtrees=("feature_extractor",))


def _trainable_mask(params, frozen_subtrees=()):
    """Bool pytree: False for any leaf under a key in `frozen_subtrees`."""

    def walk(tree, frozen):
        if isinstance(tree, dict):
            return {
                k: walk(v, frozen or (k in frozen_subtrees)) for k, v in tree.items()
            }
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, frozen) for v in tree)
        return not frozen

    return walk(params, False)
