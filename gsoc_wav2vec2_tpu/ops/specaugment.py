"""SpecAugment time masking, fully on-device.

Functional re-design of the reference (`/root/reference/src/wav2vec2/
spec_augment.py`).  The reference samples its randomness with host-side
`np.random` inside the TF graph ("tf.random generators not working on XLA
devices", `spec_augment.py:13-14`) which silently freezes the mask per trace.
Here everything runs under `jit` from explicit `jax.random` keys — an
intentional, documented divergence that fixes that latent bug.

Semantics preserved:
  * `num_mask_spans = int(mask_prob * seqlen / mask_length + U[0,1))`,
    clamped to `min_masks=2` from below and `seqlen // mask_length` from
    above (`spec_augment.py:53-59`).  Since jit needs static shapes this is
    realised as a static upper bound of spans plus a per-batch validity mask
    implementing the stochastic `+U[0,1)` carry.
  * span starts drawn without replacement from `[0, seqlen - mask_length]`
    via the Gumbel-top-k trick (`spec_augment.py:8-18`).
  * masked frames are replaced with the trainable `masked_spec_embed`
    vector (`spec_augment.py:119-128`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_mask_indices(
    rng: jax.Array,
    batch_size: int,
    seqlen: int,
    mask_prob: float,
    mask_length: int,
    min_masks: int = 2,
) -> jax.Array:
    """Boolean (batch_size, seqlen) mask of frames to replace.

    Mirrors `_compute_mask_indices` (reference `spec_augment.py:43-90`) with
    per-sample randomness (the reference draws one `num_mask_spans` for the
    whole batch; per-sample draws are strictly more faithful to SpecAugment
    and equally valid under the reference's own distribution).
    """
    if mask_length > seqlen:
        raise ValueError(
            f"`mask_length` ({mask_length}) must be smaller than "
            f"`seq_length` ({seqlen})."
        )
    base = mask_prob * seqlen / mask_length
    # Static upper bound on spans; actual count varies via the frac draw.
    max_spans = max(int(base) + 1, min_masks)
    max_spans = min(max_spans, seqlen // mask_length)

    rng_count, rng_starts = jax.random.split(rng)

    # num_spans[b] = clamp(int(base + U[0,1)), min_masks, seqlen//mask_length)
    frac = jax.random.uniform(rng_count, (batch_size,))
    num_spans = jnp.floor(base + frac).astype(jnp.int32)
    num_spans = jnp.clip(num_spans, min_masks, seqlen // mask_length)
    num_spans = jnp.minimum(num_spans, max_spans)

    # Gumbel-top-k: k distinct start positions in [0, seqlen - mask_length].
    num_candidates = seqlen - (mask_length - 1)
    z = jax.random.gumbel(rng_starts, (batch_size, num_candidates))
    _, starts = jax.lax.top_k(z, max_spans)  # (B, max_spans)

    span_valid = (
        jnp.arange(max_spans)[None, :] < num_spans[:, None]
    )  # (B, max_spans)

    # Expand each start into a span and scatter into a (B, seqlen) mask
    # without any gather/scatter op: compare against a frame iota.
    frames = jnp.arange(seqlen)[None, None, :]  # (1, 1, L)
    starts_ = starts[:, :, None]  # (B, S, 1)
    in_span = (frames >= starts_) & (frames < starts_ + mask_length)
    in_span = in_span & span_valid[:, :, None]
    return jnp.any(in_span, axis=1)  # (B, L)


def apply_spec_augmentation(
    rng: jax.Array,
    features: jax.Array,
    masked_spec_embed: jax.Array,
    mask_prob: float,
    mask_length: int,
    min_masks: int = 2,
) -> jax.Array:
    """Replace randomly-chosen time spans with the trainable mask embedding.

    Reference `spec_augment.py:93-128`.
    """
    b, l, _ = features.shape
    mask = compute_mask_indices(rng, b, l, mask_prob, mask_length, min_masks)
    fill = masked_spec_embed.astype(features.dtype)[None, None, :]
    return jnp.where(mask[:, :, None], fill, features)


def apply_feature_masking(
    rng: jax.Array,
    features: jax.Array,
    mask_prob: float,
    mask_length: int,
    min_masks: int = 0,
) -> jax.Array:
    """Zero random spans of the HIDDEN axis, shared across all time steps
    of a sample (HF `mask_feature_prob` semantics — an EXTENSION absent
    from the reference, whose SpecAugment masks time only).  Masked dims
    are set to 0, not to `masked_spec_embed` (matching HF's
    `_mask_hidden_states`: the embed vector fills time masks only)."""
    b, _, h = features.shape
    mask = compute_mask_indices(rng, b, h, mask_prob, mask_length, min_masks)
    return features * (~mask)[:, None, :].astype(features.dtype)
