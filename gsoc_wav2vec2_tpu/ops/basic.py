"""Elementary TPU-friendly building blocks.

These are the JAX equivalents of the reference's Keras layers
(`/root/reference/src/wav2vec2/tensorflow_addons.py`, Keras Dense /
LayerNormalization).  Normalisation statistics are always accumulated in
float32 regardless of the compute dtype so that bfloat16 forward passes stay
numerically stable on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gelu(x: jax.Array, approximate: bool = False) -> jax.Array:
    """GELU matching `tf.nn.gelu` (reference `feature_extractor.py:58`).

    `approximate=False` (the reference default, `config.is_gelu_approx`) uses
    the exact erf formulation — in float32.  In bfloat16 the erf polynomial
    is the single most expensive VPU chain in the whole model (~5 ms of an
    11 ms conv front-end at the 246000-sample eval shape, measured on v5e),
    while the tanh formulation deviates from erf-GELU by at most ~3e-4 —
    below bf16 resolution (ulp ≈ 4e-3 relative) everywhere the activation
    is non-negligible.  So for bf16 compute the tanh form is numerically
    indistinguishable and ~6x cheaper: precision-adaptive selection.
    Exact-dtype parity tests run in float32 and take the erf path.
    """
    if not approximate and x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=approximate)


def dense(x: jax.Array, params: dict) -> jax.Array:
    """`y = x @ kernel + bias` with a TF-layout kernel of shape (in, out)."""
    kernel = params["kernel"].astype(x.dtype)
    y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    bias = params.get("bias")
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def layer_norm(
    x: jax.Array, params: dict, eps: float = 1e-5, axis: int = -1
) -> jax.Array:
    """LayerNormalization matching Keras semantics.

    Population variance, eps inside the sqrt
    (reference uses `tf.keras.layers.LayerNormalization(epsilon=1e-5)`).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axis, keepdims=True)
    var = jnp.var(x32, axis=axis, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["gamma"].astype(jnp.float32) + params["beta"].astype(jnp.float32)
    return y.astype(dtype)


def group_norm(
    x: jax.Array, params: dict, groups: int, eps: float = 1e-5
) -> jax.Array:
    """GroupNormalization over a (B, T, C) tensor, channels-last.

    Matches the vendored tensorflow_addons layer
    (reference `tensorflow_addons.py:66-329`): reshape into
    (B, T, G, C // G) and normalise over the (T, C // G) axes.  With
    `groups == C` (the wav2vec2-base conv layer 0 case: 512 groups over 512
    channels) this degenerates to per-channel instance norm over time.
    """
    dtype = x.dtype
    b, t, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, t, groups, c // groups)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    var = jnp.var(x32, axis=(1, 3), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, t, c)
    y = y * params["gamma"].astype(jnp.float32) + params["beta"].astype(jnp.float32)
    return y.astype(dtype)


def murmur_mix(x: jax.Array) -> jax.Array:
    """Murmur3-style 32-bit avalanche finalizer (pure uint32 VPU ops).

    Used by the XLA-side dropout below.  (The Pallas flash-attention
    kernel's in-kernel dropout uses its own lighter 4-op mix — see
    `ops/pallas/flash_attention.py::_dropout_mask` — because that mask is
    regenerated over B·H·L² elements in both directions; fwd/bwd
    consistency there comes from sharing the one kernel-local function,
    not from this one.)
    """
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _hash_keep_mask(seed: jax.Array, shape, rate: float) -> jax.Array:
    """Counter-based keep-mask: `murmur_mix` of (seed, linear element
    index) — the same construction as the flash kernel's in-kernel dropout
    (`ops/pallas/flash_attention.py`).

    Why not `jax.random.bernoulli`: threefry costs ~20 VPU ops per word
    plus a materialised uniform buffer; at the training recipe shape the
    model's ~40 dropout masks cost ~90 ms/step (measured on v5e).  The hash
    is ~12 fused integer ops per element straight from an on-the-fly iota —
    no random-bits buffer ever exists.  Statistical quality is far beyond
    what dropout needs; determinism per (seed, shape) is exact.

    `seed` is a (2,) uint32 pair and both words enter separate mix rounds:
    a single 32-bit seed would birthday-collide across a long run's ~2M
    mask draws (~40/step × 50k steps), silently reusing a mask between two
    same-shaped sites; with 64 seed bits a collision needs ~2^32 draws.

    The linear element index is built SHAPE-NATIVE from per-axis
    `broadcasted_iota`s (row-major strides) rather than a 1-D `iota` +
    reshape: the reshape is a layout change XLA cannot fuse into the
    consumer, which materialised a 4-byte-per-element index buffer for
    every mask (3.6 GB for one FFN mask at the training recipe shape) —
    measured 23 ms/step of the 29 ms XLA-side dropout cost on v5e.  The
    index values (and therefore the masks) are bit-identical either way.
    """
    idx = jnp.zeros(shape, jnp.uint32)
    stride = 1
    for axis in reversed(range(len(shape))):
        idx = idx + jax.lax.broadcasted_iota(jnp.uint32, shape, axis) * jnp.uint32(
            stride
        )
        stride *= shape[axis]
    x = murmur_mix(idx ^ (seed[0].astype(jnp.uint32) * jnp.uint32(2654435761)))
    x = murmur_mix(x ^ seed[1].astype(jnp.uint32))
    threshold = jnp.uint32(int((1.0 - rate) * float(2**32 - 1)))
    return x < threshold


def dropout(
    x: jax.Array,
    rate: float,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jax.Array:
    """Inverted dropout (Keras `Dropout` semantics).

    The mask comes from a counter-based hash seeded by one 64-bit draw from
    `rng` (see `_hash_keep_mask`) — deterministic given the key, ~3x cheaper
    than threefry-per-element at training shapes.
    """
    if deterministic or rate == 0.0:
        return x
    if rng is None:
        raise ValueError("dropout requires an rng key when not deterministic")
    keep_prob = 1.0 - rate
    seed = jax.random.bits(rng, (2,), jnp.uint32)
    mask = _hash_keep_mask(seed, x.shape, rate)
    return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))


def stochastic_depth(
    residual: jax.Array,
    branch: jax.Array,
    survival_prob: float,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jax.Array:
    """Stochastic depth on a residual branch.

    Training: the branch is kept with probability `survival_prob` (a single
    Bernoulli draw for the whole batch, matching the vendored tfa layer).
    Inference: the branch is deliberately NOT rescaled by `survival_prob`
    (reference `tensorflow_addons.py:386-390` keeps the sum un-scaled so
    fine-tuned weights are not disturbed).
    """
    if deterministic or survival_prob >= 1.0:
        return residual + branch
    if rng is None:
        raise ValueError("stochastic_depth requires an rng key when training")
    keep = jax.random.bernoulli(rng, survival_prob)
    return residual + jnp.where(keep, branch, jnp.zeros_like(branch))
