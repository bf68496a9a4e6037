"""Fused (flash) self-attention Pallas kernel for the wav2vec2 encoder.

Why: at the reference's eval shape (246000 samples -> L=768 frames) the
unfused attention materialises a (B, H, L, L) float32 score tensor in HBM —
~226 MB per layer at B=8/H=12, ~2.7 GB of round-trip traffic across 12
layers, several ms of pure HBM time per forward on a v5e.  wav2vec2's
sequences are short enough that a whole head's K/V tile fits in VMEM, so the
kernel runs one (batch, head) per grid step and keeps scores entirely
on-chip: S = QK^T -> row-softmax -> PV without ever leaving VMEM.  No
K-blocking / online-softmax rescaling is needed at these lengths (L ≤ ~4k ⇒
score tile ≤ 4k×4k×4B = 64 MB would NOT fit — so we block over Q only and
keep K whole while L ≤ MAX_KV; beyond that the caller falls back to XLA).

Semantics match `ops/attention.py::mha_xla` (reference
`/root/reference/src/wav2vec2/encoder.py:22-47`): q pre-scaled by
`head_dim**-0.5` at the caller, additive mask bias on raw scores, softmax in
float32.  Attention-prob dropout is NOT supported here — callers route to
the XLA path when training with dropout > 0.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Q is blocked; K/V stay whole per (batch, head) grid step.
DEFAULT_Q_BLOCK = 256
# beyond this K/V length the whole-K design would blow VMEM; callers fall
# back to the XLA path (wav2vec2 frames: 246000 samples -> 768, 400000 -> 1249)
MAX_KV = 4096


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    """One (batch*head, q_block) grid step.

    q_ref: (1, BQ, D); k_ref/v_ref: (1, L, D); bias_ref: (1, 1, L) additive
    f32 bias (zeros when unmasked); out_ref: (1, BQ, D).
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, L)
    s = s + bias_ref[0]  # (1, L) broadcasts over BQ

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # match mha_xla numerics: probs cast to the compute dtype before PV
    p = (p / l).astype(v.dtype)
    out = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    q_block: int = DEFAULT_Q_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention: softmax(q @ k^T + bias) @ v.

    Args:
      q, k, v: (B, H, L, D); q already scaled by `D**-0.5`.
      bias: optional additive f32 bias broadcastable to (B, 1, 1, L) —
        the `mask_to_bias` output; keys only (no per-query masking, which
        wav2vec2 never needs).
    Returns:
      (B, H, L, D) in q.dtype.
    """
    b, h, l, d = q.shape
    if bias is None:
        bias = jnp.zeros((b, 1, 1, l), jnp.float32)
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, 1, 1, l))

    bq = min(q_block, l)
    while l % bq:
        bq //= 2  # l is always a multiple of some power of two block
    grid = (b * h, l // bq)

    flat_q = q.reshape(b * h, l, d)
    flat_k = k.reshape(b * h, l, d)
    flat_v = v.reshape(b * h, l, d)

    out = pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, l),
                lambda i, j, h=h: (i // h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * l * d,
            bytes_accessed=(3 * b * h * l * d + b * h * l * d) * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(flat_q, flat_k, flat_v, bias.reshape(b, 1, l))

    return out.reshape(b, h, l, d)


def supports(l: int, d: int, dropout_active: bool) -> bool:
    """Whether the fused kernel can serve this shape/config."""
    return (not dropout_active) and l <= MAX_KV and l % 128 == 0 and d % 64 == 0
