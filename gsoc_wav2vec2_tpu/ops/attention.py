"""Multi-head self-attention for the wav2vec2 transformer encoder.

Semantics match the reference (`/root/reference/src/wav2vec2/encoder.py:6-65`):
separate q/k/v/out projections, query scaled by `head_size ** -0.5`, additive
mask bias applied to the raw scores, dropout on the softmax probabilities.

Two execution paths:
  * `mha_xla` — plain einsum formulation; XLA fuses it well at wav2vec2's
    768-frame sequence length and it is the numerically-exact parity path.
  * a Pallas flash-attention kernel (see `ops/pallas/flash_attention.py`)
    used for long sequences / bf16 throughput, selected by the caller.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .basic import dense, dropout


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, L, H) -> (B, num_heads, L, head_size)."""
    b, l, h = x.shape
    return x.reshape(b, l, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, num_heads, L, head_size) -> (B, L, H)."""
    b, n, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, n * d)


def mha_xla(
    x: jax.Array,
    params: dict,
    num_heads: int,
    mask_bias: Optional[jax.Array] = None,
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Full-materialisation attention (reference `encoder.py:22-47`).

    `mask_bias` is an additive float bias broadcastable to
    (B, num_heads, L, L) — typically (B, 1, 1, L) with 0 / -10000 entries.
    """
    head_size = x.shape[-1] // num_heads
    q = split_heads(dense(x, params["q_proj"]), num_heads)
    k = split_heads(dense(x, params["k_proj"]), num_heads)
    v = split_heads(dense(x, params["v_proj"]), num_heads)

    q = q * jnp.asarray(head_size ** -0.5, dtype=q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if mask_bias is not None:
        scores = scores + mask_bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    probs = dropout(probs, dropout_rate, rng, deterministic)
    context = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=x.dtype)
    return dense(merge_heads(context), params["out_proj"])


def mha(
    x: jax.Array,
    params: dict,
    num_heads: int,
    mask_bias: Optional[jax.Array] = None,
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    impl: str = "auto",
    mesh=None,
) -> jax.Array:
    """Dispatch between the fused Pallas kernel and the XLA einsum path.

    `impl`: "auto" (fused on TPU when shapes allow and attention-prob
    dropout is inactive), "flash", or "xla".

    `mesh`: the ("data", "model") `jax.sharding.Mesh` of the surrounding
    SPMD program, if any.  The Pallas kernel is a custom call that GSPMD
    cannot partition, so under a multi-device mesh the flash path runs
    through a `shard_map` wrapper (batch over "data", heads over "model")
    instead of being gathered whole onto every device.
    """
    if impl == "auto":
        from .pallas.flash_attention import supports

        l = x.shape[1]
        head_dim = x.shape[-1] // num_heads
        use_flash = (
            jax.default_backend() == "tpu"
            and supports(l, head_dim, training=not deterministic)
        )
        impl = "flash" if use_flash else "xla"

    if impl == "xla":
        return mha_xla(
            x, params, num_heads, mask_bias,
            dropout_rate=dropout_rate, rng=rng, deterministic=deterministic,
        )

    from .pallas.flash_attention import (
        flash_attention,
        shard_mapped_flash_attention,
    )

    head_size = x.shape[-1] // num_heads
    q = split_heads(dense(x, params["q_proj"]), num_heads)
    k = split_heads(dense(x, params["k_proj"]), num_heads)
    v = split_heads(dense(x, params["v_proj"]), num_heads)
    q = q * jnp.asarray(head_size ** -0.5, dtype=q.dtype)
    rate, seed = 0.0, 0
    if not deterministic and dropout_rate > 0.0:
        # attention-prob dropout runs inside the kernel; the mask is
        # regenerated in the backward pass from this per-call seed
        rate = dropout_rate
        if rng is not None:
            seed = jax.random.randint(rng, (), 0, 2**23, dtype=jnp.int32)
    if mesh is not None and mesh.size > 1:
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

        context = shard_mapped_flash_attention(
            q, k, v, mask_bias, mesh=mesh,
            data_axis=DATA_AXIS, model_axis=MODEL_AXIS,
            dropout_rate=rate, dropout_seed=seed,
        )
    else:
        context = flash_attention(q, k, v, mask_bias, dropout_rate=rate,
                                  dropout_seed=seed)
    return dense(merge_heads(context), params["out_proj"])


def mask_to_bias(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Boolean frame mask (B, L) -> additive bias (B, 1, 1, L).

    Masked (False) positions get -10000, matching the reference's bias value
    (`encoder.py:256-263`); the reference builds a (B, 1, L, L) tensor through
    a repeat/reshape/transpose dance to dodge a TF SavedModel limitation —
    broadcasting does the same job here.
    """
    bias = (1.0 - attention_mask.astype(dtype)) * -10000.0
    return bias[:, None, None, :]
