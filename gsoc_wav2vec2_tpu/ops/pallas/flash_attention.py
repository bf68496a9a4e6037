"""Fused (flash) self-attention Pallas kernels for the wav2vec2 encoder.

Why: at the reference's eval shape (246000 samples -> L=768 frames) the
unfused attention materialises a (B, H, L, L) float32 score tensor in HBM —
~226 MB per layer at B=8/H=12, ~2.7 GB of round-trip traffic across 12
layers.  wav2vec2's sequences are short enough that a whole head's K/V tile
fits in VMEM, so the primary kernels run one (batch, head) per grid step
and keep scores entirely on-chip with NO online-softmax rescaling (measured
faster than the blocked recurrence at recipe shapes).  Beyond
WHOLE_KV_LIMIT (4096 frames) a second kernel family takes over: the
standard kv-blocked online-softmax forward plus a two-pass (dq, dk/dv)
backward whose VMEM footprint is independent of L — lifting both the
inference and the training cap to MAX_KV(_TRAIN) = 32768 frames (~11 min
of audio), where the XLA fallback cannot train at all (a 76 GB dropout
mask at 8k frames).

Training support (custom VJP):
  * forward also emits the per-row logsumexp; backward recomputes the
    (L, L) probability tile in VMEM (s = qk^T + bias; p = exp(s - lse)) —
    nothing quadratic ever reaches HBM in either direction;
  * attention-prob dropout (reference `encoder.py:46`) runs INSIDE the
    kernel from a counter-based hash of (seed, element index): the mask is
    regenerated bit-identically in the backward pass, so the (B, H, L, L)
    dropout mask never exists anywhere.

Semantics match `ops/attention.py::mha_xla` (reference
`/root/reference/src/wav2vec2/encoder.py:22-47`): q pre-scaled by
`head_dim**-0.5` at the caller, additive key bias on raw scores, softmax in
float32, probs cast to the compute dtype before PV.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_Q_BLOCK = 256
# whole-K, q-blocked design: K/V live whole in VMEM, scores exist only as
# (q_block, L) tiles in BOTH directions, so the cap is one (L, D) K tile
# plus a few (q_block, L) f32 tiles — 4096 frames covers every wav2vec2
# shape (246000 samples -> 768 frames, 400000 -> 1249) with headroom.
# Beyond it the kv-blocked online-softmax kernels take over (the standard
# flash recurrence: VMEM scales with the BLOCK sizes, not L), raising the
# cap to 32768 frames (~10.9 M samples, ~11 min of 16 kHz audio) in both
# inference and training — past that, lse/delta rows and the (B, H, L, D)
# residuals themselves stop being sensible single-chip objects.
WHOLE_KV_LIMIT = 4096  # whole-K/V fast path up to here (measured faster)
MAX_KV = 32768
MAX_KV_TRAIN = 32768
BLOCKED_Q = 512  # kv-blocked path tile sizes: (512, 1024) f32 score tile
BLOCKED_KV = 1024  # = 2 MB; K/V/q/acc blocks add ~0.5 MB — VMEM-safe at any L
WHOLE_L_BWD_LIMIT = 1024  # backward uses one whole-L q block up to this L
# Forward mirrors the backward's whole-L policy: at the recipe shape
# (768 frames) one (L, L) f32 score tile is 2.4 MB — a single grid step
# per (b, h) removes the q-block pipeline overhead entirely.  Measured on
# v5e at B=32×246k train: whole-L 238.1-238.4 ms/step vs 256-block
# 243.6-246.5 ms (3 trials each); q_block=128 regresses to 252 ms.
WHOLE_L_FWD_LIMIT = 1024


def _dropout_mask(shape, rate: float, seed, row_offset, col_offset=0,
                  row_stride=None):
    """Counter-based keep-mask: integer mix of (seed, GLOBAL element
    index).  Stateless and layout-independent, so the forward and backward
    kernels regenerate bit-identical masks regardless of their q-block
    grids — the hardware PRNG (`pltpu.prng_random_bits`) does NOT
    guarantee that: its bit-to-element mapping follows the vector layout
    Mosaic picks per kernel (observed as a fwd/bwd mask mismatch in
    finite-difference tests).  `row_offset` maps the block-local row to the
    global row so differently-blocked kernels agree.

    The mix is a 4-op mul/xorshift/mul chain rather than the XLA-side
    dropout's full murmur finaliser: this mask is regenerated over
    B·H·L² elements in BOTH directions (~5.2 G elements/step at the
    training recipe shape), where the 3 saved VPU ops are worth ~5 ms/step
    on v5e (244 → 239 ms).  Quality is ample for prob-dropout: the seed
    lands in every bit through the first multiply, the xorshift folds high
    entropy down, and the second multiply re-spreads it to the high bits
    the threshold compare weighs most; the keep decision is exactly
    Bernoulli(1-rate) per element either way.
    """
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row_offset)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(col_offset)
    # `row_stride` is the GLOBAL row length (defaults to this block's width,
    # which is correct when blocks span whole rows); the kv-blocked kernels
    # pass the padded L so (row, col) hashes to the same element index no
    # matter how any kernel tiles the score matrix
    stride = shape[1] if row_stride is None else row_stride
    x = rows * jnp.uint32(stride) + cols
    x = (x ^ (seed.astype(jnp.uint32) * jnp.uint32(2654435761))) * jnp.uint32(
        0x7FEB352D
    )
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    threshold = jnp.uint32(int((1.0 - rate) * float(2**32 - 1)))
    return x < threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, lse_ref,
                *, dropout_rate: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[0]

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]
    p = (e / l).astype(v.dtype)

    if dropout_rate > 0.0:
        keep = _dropout_mask(
            p.shape, dropout_rate, seed_ref[0] + i, j * p.shape[0]
        )
        p = jnp.where(keep, p / (1.0 - dropout_rate), jnp.zeros_like(p)).astype(
            v.dtype
        )

    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, dropout_rate: float):
    """Q-blocked backward: grid (B*H, L/q_block).

    Each step recomputes a (q_block, L) probability tile from its q rows and
    the whole K (which stays resident in VMEM across the inner grid axis),
    emits that block's dq, and accumulates dk/dv in float32 into output
    blocks that the index map pins to the same position for every j — the
    standard Pallas revisit-accumulate pattern.  The per-row softmax delta
    needs only this block's full row, so no cross-block reduction exists and
    VMEM scales as q_block·L instead of L² (this is what lifts the training
    cap from 1024 to 4096 frames — the 400 000-sample recipe shape is 1249).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]   # (bq, d)
    k = k_ref[0]   # (L, d)
    v = v_ref[0]
    do = do_ref[0]  # (bq, d)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[0]
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # (bq, L) f32

    dpt = jax.lax.dot_general(  # dout @ v^T
        do.astype(v.dtype), v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if dropout_rate > 0.0:
        keep = _dropout_mask(
            p.shape, dropout_rate, seed_ref[0] + i, j * p.shape[0]
        )
        scale = 1.0 / (1.0 - dropout_rate)
        r = jnp.where(keep, p * scale, jnp.zeros_like(p))
        dp = jnp.where(keep, dpt * scale, jnp.zeros_like(dpt))
    else:
        r = p
        dp = dpt

    # softmax jacobian: ds = p ⊙ (dp − Σ_k p⊙dp); with dropout the delta
    # term is Σ_k r⊙dpt == Σ_k p⊙dp (both equal Σ dout⊙out per row)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)

    dq_ref[0] = jax.lax.dot_general(  # ds @ k
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    # dk/dv accumulate across q blocks in f32 (the caller casts once at the
    # end); their output blocks revisit index (i, 0, 0) for every j
    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += jax.lax.dot_general(  # ds^T @ q
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(  # r^T @ dout
        r.astype(v.dtype), do.astype(v.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)


def _flash_fwd(q, k, v, bias, seed, dropout_rate: float, q_block: int,
               interpret: bool):
    b, h, l, d = q.shape
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, 1, 1, l))

    # dropout masks are generated from GLOBAL (row, col) indices, so fwd and
    # bwd may block the q axis independently
    bq = l if l <= WHOLE_L_FWD_LIMIT else min(q_block, l)
    while l % bq:
        bq //= 2
    grid = (b * h, l // bq)

    flat = lambda x: x.reshape(b * h, l, d)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, dropout_rate=dropout_rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j, *_: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l, d), lambda i, j, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l, d), lambda i, j, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, l), lambda i, j, *_, h=h: (i // h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j, *_: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bq), lambda i, j, *_: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, l), jnp.float32),
        ],
        # grid steps are independent: lets Mosaic pipeline them instead of
        # synchronising (measured 3.1 -> 1.8 ms at B16/H12/L768)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * l * d,
            bytes_accessed=4 * b * h * l * d * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(seed, flat(q), flat(k), flat(v), bias.reshape(b, 1, l))
    return out.reshape(b, h, l, d), lse.reshape(b, h, l)


def _flash_bwd(q, k, v, bias, seed, lse, dout, dropout_rate: float,
               q_block: int, interpret: bool):
    b, h, l, d = q.shape
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, 1, 1, l))
    # VMEM holds ~4 (bq, L) f32 tiles + whole K/V.  Up to WHOLE_L_BWD_LIMIT
    # frames the whole-L block fits (~16 MB) and keeps the grid fully
    # parallel (no dk/dv revisit serialisation) — that covers the
    # 246000-sample recipe shape (768 frames); longer sequences shrink the
    # q block to bound the working set at ~8 MB.  (Module-level knob so the
    # block strategy can be swept in-situ; 768-frame measurement on v5e:
    # whole-L 246 ms/step vs q-blocked 256 ms — whole-L wins.)
    if l <= WHOLE_L_BWD_LIMIT:
        bq = l
    else:
        bq = min(q_block if l <= 2048 else q_block // 2, l)
    while l % bq:
        bq //= 2
    grid = (b * h, l // bq)
    flat = lambda x: x.reshape(b * h, l, d)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, dropout_rate=dropout_rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j, *_: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l, d), lambda i, j, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l, d), lambda i, j, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, l), lambda i, j, *_, h=h: (i // h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bq), lambda i, j, *_: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, d), lambda i, j, *_: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j, *_: (i, j, 0),
                             memory_space=pltpu.VMEM),
                # dk/dv revisit the same block for every j: f32 accumulators
                pl.BlockSpec((1, l, d), lambda i, j, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l, d), lambda i, j, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, l, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, l, d), jnp.float32),
        ],
        # j revisits the dk/dv accumulators -> sequential ("arbitrary")
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * l * l * d,
            bytes_accessed=7 * b * h * l * d * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(seed, flat(q), flat(k), flat(v), bias.reshape(b, 1, l),
      lse.reshape(b * h, 1, l), flat(dout))
    unflat = lambda x: x.reshape(b, h, l, d)
    return unflat(dq), unflat(dk).astype(q.dtype), unflat(dv).astype(q.dtype)


def _pick_block(limit: int, l: int) -> int:
    """Largest power-of-two-halving of `limit` that divides `l` (l is a
    multiple of 128, so this terminates at >= 128)."""
    b = min(limit, l)
    while l % b:
        b //= 2
    return b


def _fwd_blocked_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref,
                        lse_ref, acc_ref, m_ref, l_ref, *,
                        dropout_rate: float, nk: int, l_total: int):
    """Online-softmax forward, grid (B*H, L/bq, L/bk) with kv minor.

    The classic flash recurrence the whole-K kernels skip: running row max
    `m`, running normaliser `l` and an unnormalised accumulator `acc` live
    in VMEM scratch across the kv axis; each step rescales them by
    `exp(m_prev - m_new)` and folds in one (bq, bk) score tile, so VMEM
    scales with the BLOCK sizes instead of L.  Dropout applies the keep
    mask to the UNNORMALISED probabilities — masking commutes with the
    final /l, so the result matches the whole-K kernel's
    dropout-after-normalise bit-for-bit in exact arithmetic (and the mask
    itself is identical: `_dropout_mask` hashes global (row, col) element
    indices with the global row stride).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[0]  # (bq, bk)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)  # first step: exp(-inf - finite) = 0
    p = jnp.exp(s - m_new)
    l_ref[...] = jnp.broadcast_to(
        alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    if dropout_rate > 0.0:
        keep = _dropout_mask(
            p.shape, dropout_rate, seed_ref[0] + i,
            j * p.shape[0], kk * p.shape[1], l_total,
        )
        p = jnp.where(keep, p / (1.0 - dropout_rate), jnp.zeros_like(p))

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kk == nk - 1)
    def _finalize():
        out_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(out_ref.dtype)
        lse_ref[0, 0] = m_ref[:, 0] + jnp.log(l_ref[:, 0])


def _dq_blocked_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, lse_ref,
                       delta_ref, do_ref, dq_ref, *, dropout_rate: float,
                       l_total: int):
    """dq pass, grid (B*H, L/bq, L/bk): each step recomputes one (bq, bk)
    probability tile from (q, k, lse) and accumulates `ds @ k` into the
    f32 dq block, which revisits index (i, j) across the minor kv axis.
    `delta` (the per-row softmax correction Σ dout·out) is computed once in
    XLA from the saved forward output — with dropout it equals
    Σ_k r·dpt exactly as in the whole-K kernel's in-row reduction."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    kk = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[0]
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # (bq, bk)
    dpt = jax.lax.dot_general(
        do.astype(v.dtype), v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        keep = _dropout_mask(
            p.shape, dropout_rate, seed_ref[0] + i,
            j * p.shape[0], kk * p.shape[1], l_total,
        )
        dp = jnp.where(keep, dpt / (1.0 - dropout_rate), jnp.zeros_like(dpt))
    else:
        dp = dpt
    ds = (p * (dp - delta_ref[0, 0][:, None])).astype(q.dtype)

    @pl.when(kk == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    dq_ref[0] += jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dkv_blocked_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, lse_ref,
                        delta_ref, do_ref, dk_ref, dv_ref, *,
                        dropout_rate: float, l_total: int):
    """dk/dv pass, grid (B*H, L/bk, L/bq): the transpose iteration order —
    for each kv block the q axis is minor, so the f32 dk/dv blocks revisit
    index (i, kk) across consecutive steps and accumulate `ds^T @ q` /
    `r^T @ dout` without any cross-step reduction leaving VMEM."""
    i = pl.program_id(0)
    kk = pl.program_id(1)
    j = pl.program_id(2)
    q = q_ref[0]   # (bq, d)
    k = k_ref[0]   # (bk, d)
    v = v_ref[0]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[0]
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # (bq, bk)
    dpt = jax.lax.dot_general(
        do.astype(v.dtype), v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        keep = _dropout_mask(
            p.shape, dropout_rate, seed_ref[0] + i,
            j * p.shape[0], kk * p.shape[1], l_total,
        )
        scale = 1.0 / (1.0 - dropout_rate)
        r = jnp.where(keep, p * scale, jnp.zeros_like(p))
        dp = jnp.where(keep, dpt * scale, jnp.zeros_like(dpt))
    else:
        r = p
        dp = dpt
    ds = (p * (dp - delta_ref[0, 0][:, None])).astype(q.dtype)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += jax.lax.dot_general(  # ds^T @ q
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[0] += jax.lax.dot_general(  # r^T @ dout
        r.astype(v.dtype), do.astype(v.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_fwd_blocked(q, k, v, bias, seed, dropout_rate: float,
                       interpret: bool):
    b, h, l, d = q.shape
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, 1, 1, l))
    bq = _pick_block(BLOCKED_Q, l)
    bk = _pick_block(BLOCKED_KV, l)
    nk = l // bk
    grid = (b * h, l // bq, nk)
    flat = lambda x: x.reshape(b * h, l, d)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_blocked_kernel, dropout_rate=dropout_rate, nk=nk, l_total=l
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j, kk, *_: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, d), lambda i, j, kk, *_: (i, kk, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, d), lambda i, j, kk, *_: (i, kk, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bk), lambda i, j, kk, *_, h=h: (i // h, 0, kk),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                # revisited across the kv axis; written at the last step
                pl.BlockSpec((1, bq, d), lambda i, j, kk, *_: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bq), lambda i, j, kk, *_: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, d), jnp.float32),    # acc
                pltpu.VMEM((bq, 128), jnp.float32),  # running max (lane-bcast)
                pltpu.VMEM((bq, 128), jnp.float32),  # running normaliser
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, l), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * l * d,
            bytes_accessed=4 * b * h * l * d * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(seed, flat(q), flat(k), flat(v), bias.reshape(b, 1, l))
    return out.reshape(b, h, l, d), lse.reshape(b, h, l)


def _flash_bwd_blocked(q, k, v, bias, seed, lse, out, dout,
                       dropout_rate: float, interpret: bool):
    b, h, l, d = q.shape
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, 1, 1, l))
    bq = _pick_block(BLOCKED_Q, l)
    bk = _pick_block(BLOCKED_KV, l)
    flat = lambda x: x.reshape(b * h, l, d)
    # per-row softmax correction Σ_d dout·out == Σ_k p·dp (the whole-K
    # kernel reduces it in-row; blocked rows never exist whole, so it is
    # one cheap XLA reduction over the saved forward output instead)
    delta = jnp.sum(
        out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1
    ).reshape(b * h, 1, l)
    lse_flat = lse.reshape(b * h, 1, l)

    common_specs = [
        pl.BlockSpec((1, bq, d), lambda i, j, kk, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, d), lambda i, j, kk, *_: (i, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, d), lambda i, j, kk, *_: (i, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk), lambda i, j, kk, *_, h=h: (i // h, 0, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq), lambda i, j, kk, *_: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq), lambda i, j, kk, *_: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, d), lambda i, j, kk, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]

    dq = pl.pallas_call(
        functools.partial(
            _dq_blocked_kernel, dropout_rate=dropout_rate, l_total=l
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, l // bq, l // bk),
            in_specs=common_specs,
            out_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j, kk, *_: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b * h, l, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * h * l * l * d,
            bytes_accessed=5 * b * h * l * d * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(seed, flat(q), flat(k), flat(v), bias.reshape(b, 1, l), lse_flat,
      delta, flat(dout))[0]

    # transpose iteration: q minor so dk/dv revisit-accumulate per kv block
    kv_specs = [
        pl.BlockSpec((1, bq, d), lambda i, kk, j, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, d), lambda i, kk, j, *_: (i, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, d), lambda i, kk, j, *_: (i, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk), lambda i, kk, j, *_, h=h: (i // h, 0, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq), lambda i, kk, j, *_: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq), lambda i, kk, j, *_: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, d), lambda i, kk, j, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_blocked_kernel, dropout_rate=dropout_rate, l_total=l
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, l // bk, l // bq),
            in_specs=kv_specs,
            out_specs=[
                pl.BlockSpec((1, bk, d), lambda i, kk, j, *_: (i, kk, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, d), lambda i, kk, j, *_: (i, kk, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, l, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, l, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * b * h * l * l * d,
            bytes_accessed=6 * b * h * l * d * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(seed, flat(q), flat(k), flat(v), bias.reshape(b, 1, l), lse_flat,
      delta, flat(dout))

    unflat = lambda x: x.reshape(b, h, l, d)
    return (
        unflat(dq).astype(q.dtype),
        unflat(dk).astype(q.dtype),
        unflat(dv).astype(q.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_attention_core(q, k, v, bias, seed_f, dropout_rate, q_block,
                          interpret):
    seed = seed_f.reshape(1).astype(jnp.int32)
    if q.shape[2] > WHOLE_KV_LIMIT:
        out, _ = _flash_fwd_blocked(q, k, v, bias, seed, dropout_rate, interpret)
    else:
        out, _ = _flash_fwd(q, k, v, bias, seed, dropout_rate, q_block, interpret)
    return out


def _core_fwd(q, k, v, bias, seed_f, dropout_rate, q_block, interpret):
    seed = seed_f.reshape(1).astype(jnp.int32)
    if q.shape[2] > WHOLE_KV_LIMIT:
        out, lse = _flash_fwd_blocked(
            q, k, v, bias, seed, dropout_rate, interpret
        )
        # the blocked backward also needs the forward OUTPUT (its per-row
        # softmax correction is Σ dout·out — rows never exist whole there)
        return out, (q, k, v, bias, seed_f, lse, out)
    out, lse = _flash_fwd(q, k, v, bias, seed, dropout_rate, q_block, interpret)
    return out, (q, k, v, bias, seed_f, lse)


def _core_bwd(dropout_rate, q_block, interpret, residuals, dout):
    if len(residuals) == 7:  # kv-blocked path (L > WHOLE_KV_LIMIT)
        q, k, v, bias, seed_f, lse, out = residuals
        seed = seed_f.reshape(1).astype(jnp.int32)
        dq, dk, dv = _flash_bwd_blocked(
            q, k, v, bias, seed, lse, out, dout, dropout_rate, interpret
        )
        return dq, dk, dv, jnp.zeros_like(bias), jnp.zeros_like(seed_f)
    q, k, v, bias, seed_f, lse = residuals
    seed = seed_f.reshape(1).astype(jnp.int32)
    dq, dk, dv = _flash_bwd(
        q, k, v, bias, seed, lse, dout, dropout_rate, q_block, interpret
    )
    # bias is a mask constant in this model family; seed is rng plumbing
    return dq, dk, dv, jnp.zeros_like(bias), jnp.zeros_like(seed_f)


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_seed: int = 0,
    q_block: int = DEFAULT_Q_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention: softmax(q @ k^T + bias) [-> prob dropout] @ v.

    Args:
      q, k, v: (B, H, L, D); q already scaled by `D**-0.5`.
      bias: optional additive f32 bias broadcastable to (B, 1, 1, L)
        (key mask only — all wav2vec2 needs).
      dropout_rate / dropout_seed: attention-prob dropout, applied inside
        the kernel from the TPU PRNG (seed may be a traced int32 scalar).
    Differentiable via custom VJP (q, k, v).
    """
    b, h, l, d = q.shape
    if bias is None:
        bias = jnp.zeros((b, 1, 1, l), jnp.float32)

    # arbitrary lengths: pad L up to a lane multiple with -inf key bias
    # (padded queries produce garbage rows that are sliced away; padding
    # sits OUTSIDE the custom VJP so autodiff handles the pad/slice)
    lp = -(-l // 128) * 128
    if lp != l:
        pad = [(0, 0), (0, 0), (0, lp - l), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        bias = jnp.pad(
            bias, [(0, 0), (0, 0), (0, 0), (0, lp - l)],
            constant_values=-1e9,
        )

    # f32 carries seeds up to 2^24 exactly; callers draw from that range
    seed_f = jnp.asarray(dropout_seed, jnp.float32)
    out = _flash_attention_core(
        q, k, v, bias, seed_f,
        float(dropout_rate), int(q_block), interpret,
    )
    return out[:, :, :l, :] if lp != l else out


def shard_mapped_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    *,
    mesh,
    data_axis: str,
    model_axis: str,
    dropout_rate: float = 0.0,
    dropout_seed=0,
    q_block: int = DEFAULT_Q_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """`flash_attention` partitioned over a ("data", "model") mesh.

    GSPMD treats a `pallas_call` as an opaque custom call, so under pjit it
    would gather the full (B, H, L, D) q/k/v onto every device before the
    kernel.  `shard_map` instead runs one kernel instance per shard on its
    local block — batch split over the data axis, heads over the model axis
    (matching `parallel/partition.py`'s column-sharded q/k/v projections) —
    with zero collectives: attention is embarrassingly parallel over (B, H).

    Each shard folds its linear mesh index into the dropout seed so masks
    are decorrelated across shards (the in-kernel counter hash otherwise
    reuses (seed + grid index) identically on every shard).
    """
    from jax.sharding import PartitionSpec as P

    b, h, l, _ = q.shape
    data_size = mesh.shape[data_axis]
    model_size = mesh.shape[model_axis]
    if b % data_size or h % model_size:
        raise ValueError(
            f"batch {b} / heads {h} not divisible by mesh "
            f"({data_size} data, {model_size} model)"
        )
    if bias is None:
        bias = jnp.zeros((b, 1, 1, l), jnp.float32)
    else:
        bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, 1, 1, l))
    seed_arr = jnp.asarray(dropout_seed, jnp.int32)

    qkv_spec = P(data_axis, model_axis, None, None)
    bias_spec = P(data_axis, None, None, None)

    def local(q, k, v, bias, seed):
        shard = (
            jax.lax.axis_index(data_axis) * model_size
            + jax.lax.axis_index(model_axis)
        )
        # 2**20 > any (grid index + caller seed < 2**23) stride collision in
        # the uint32 hash domain matters statistically, not bit-exactly
        local_seed = seed + shard * jnp.int32(2**20)
        return flash_attention(
            q, k, v, bias,
            dropout_rate=dropout_rate,
            dropout_seed=local_seed,
            q_block=q_block,
            interpret=interpret,
        )

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so the rep checker cannot type it (and there are no
    # collectives here for it to verify anyway)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec, P()),
        out_specs=qkv_spec,
        check_vma=False,
    )(q, k, v, bias, seed_arr)


def supports(l: int, d: int, *, training: bool = False) -> bool:
    """Whether the fused kernel can serve this shape/mode.

    Any length up to MAX_KV(_TRAIN) works (non-multiples of 128 are padded
    with -inf key bias internally): whole-K/V kernels up to WHOLE_KV_LIMIT,
    the kv-blocked online-softmax family beyond — in both inference and
    training.
    """
    limit = MAX_KV_TRAIN if training else MAX_KV
    return l <= limit and d % 64 == 0
