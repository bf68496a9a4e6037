"""Fused conv front-end Pallas kernel (layers 0+1 of the feature encoder).

The wav2vec2-base front-end opens with
    conv0 (k=10, s=5, 1->512ch) -> GroupNorm(512 groups == instance norm
    over time) -> GELU -> conv1 (k=3, s=2, 512->512) -> GELU
(reference `/root/reference/src/wav2vec2/feature_extractor.py:6-59`).

XLA executes this as four HBM round-trips over the (B, 49199, 512)
intermediate (~400 MB each way at the 246000-sample eval shape).  Two
observations make it collapse:

1. **conv0 is linear and FLOP-trivial** (C_in = 1), so its output never
   needs to exist in HBM.  GroupNorm statistics are computed EXACTLY on the
   XLA side from sufficient statistics of the sample windows: per-channel
   mean is `(Σ_t window_t) @ W0 / T`, and the per-channel sum of squares is
   `diag(W0ᵀ G W0)` with the tiny Gram matrix `G = Σ_t window_t window_tᵀ`
   (10×10) — ~26 MB of reads instead of a 400 MB materialise + re-read.
2. conv0's stride-5 window stream splits into two stride-10 phases that are
   PURE RESHAPES of the waveform: `A[r] = x[10r:10r+10]` (even conv0 rows)
   and `B[r] = x[10r+5:10r+15]` (odd rows).  conv1 (k=3, s=2) output row r
   then needs conv0 rows 2r, 2r+1, 2r+2 = A[r], B[r], A[r+1] — the kernel
   computes the A and B row tiles on the MXU (plus an 8-row halo block of A
   for the +1 shift), normalises + GELUs in VMEM, and accumulates
   `Σ gelu(norm(·)) @ W1[j]`.  No (B, T, C) intermediate ever reaches HBM.

Earlier iterations of this kernel (see git history) lost to XLA because of
three-phase recompute (1.5x the skinny-matmul work) and an XLA-side
mask+pad prep that cost more than it saved; this version reuses the A phase
for the shifted rows, keeps the window dim at its natural 10 lanes, and
replaces masking with exact contiguous-slice statistics.

Inference-path only (no custom VJP) — training keeps the XLA path, where
the conv stack is frozen by the reference recipe anyway (`main.py:236-237`).
Enabled on TPU via `supports()`; set W2V2_FUSED_CONV=0 to force the XLA
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # conv1 output rows per grid step
HALO = 8    # A-phase rows fetched from the next tile (only row 0 is used)


def _stats_kernel(a_ref, b_ref, out_ref, *, na: int, nb: int):
    """Sufficient statistics for the exact GroupNorm: accumulates the 10x10
    window Gram matrix and the 10-vector row sum over both stride phases.

    XLA lane-pads the 10-wide reduction arrays 12.8x internally (~2 ms of
    prep at the eval shape, the dominant non-kernel cost of the fused
    front-end); here the masked (TILE, 10) tiles stay at natural width and
    the accumulator lives in the revisited output block.
    """
    t = pl.program_id(1)
    base = t * TILE
    a = a_ref[0].astype(jnp.float32)
    bb = b_ref[0].astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + base
    a = jnp.where(rows < na, a, 0.0)
    bb = jnp.where(rows < nb, bb, 0.0)
    gram = jax.lax.dot_general(
        a, a, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        bb, bb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rsum = jnp.sum(a, axis=0) + jnp.sum(bb, axis=0)

    @pl.when(t == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0, :10, :] += gram
    out_ref[0, 10:11, :] += rsum[None, :]


def _window_stats(pa, pb, na: int, nb: int, interpret: bool):
    """(B, R, 10) phases -> (gram (B, 10, 10), row_sum (B, 10)) in f32."""
    b, r, _ = pa.shape
    out = pl.pallas_call(
        functools.partial(_stats_kernel, na=na, nb=nb),
        grid=(b, r // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 10), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 10), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, 10), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 16, 10), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * r * 10 * 10,
            bytes_accessed=2 * b * r * 10 * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pa, pb)
    return out[:, :10, :], out[:, 10, :]


def _kernel_robust(a_ref, b_ref, a2_ref, p0_ref, p1_ref, w0_ref, w1_ref,
                   out_ref, *, gelu_approx: bool, eps: float):
    """Robust/large-family variant (reference `feature_extractor.py:40-52`
    with `RobustWav2Vec2Config`): LayerNorm after BOTH convs instead of one
    GroupNorm, plus conv biases.  LayerNorm is per-frame over channels, so
    no global statistics pass exists at all — both norms compute entirely
    on the tile in VMEM.

    p0/p1_ref: (1, 4, C) f32 — rows [bias, gamma, beta, unused] per conv.
    """
    b0 = p0_ref[0, 0, :][None, :]
    g0 = p0_ref[0, 1, :][None, :]
    be0 = p0_ref[0, 2, :][None, :]
    b1 = p1_ref[0, 0, :][None, :]
    g1 = p1_ref[0, 1, :][None, :]
    be1 = p1_ref[0, 2, :][None, :]

    def ln(y, gamma, beta):
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        return (y - mean) * jax.lax.rsqrt(var + eps) * gamma + beta

    def conv0_norm_gelu(windows):
        y = jnp.dot(windows, w0_ref[:], preferred_element_type=jnp.float32)
        y = ln(y + b0, g0, be0)
        return jax.nn.gelu(y, approximate=gelu_approx)  # f32

    ya32 = conv0_norm_gelu(a_ref[0])
    yb = conv0_norm_gelu(b_ref[0]).astype(w1_ref.dtype)
    yh32 = conv0_norm_gelu(a2_ref[0])
    rows = jax.lax.broadcasted_iota(jnp.int32, ya32.shape, 0)
    yc = jnp.where(
        rows == ya32.shape[0] - 1,
        jnp.broadcast_to(yh32[:1], ya32.shape),
        pltpu.roll(ya32, shift=ya32.shape[0] - 1, axis=0),
    ).astype(w1_ref.dtype)
    ya = ya32.astype(w1_ref.dtype)

    y1 = jnp.dot(ya, w1_ref[0], preferred_element_type=jnp.float32)
    y1 += jnp.dot(yb, w1_ref[1], preferred_element_type=jnp.float32)
    y1 += jnp.dot(yc, w1_ref[2], preferred_element_type=jnp.float32)
    y1 = ln(y1 + b1, g1, be1)
    y1 = jax.nn.gelu(y1, approximate=gelu_approx)
    out_ref[0] = y1.astype(out_ref.dtype)


def _kernel(a_ref, b_ref, a2_ref, stats_ref, w0_ref, w1_ref, out_ref,
            *, gelu_approx: bool):
    """Grid: (B, T1p // TILE).

    a/b_ref: (1, TILE, 10) stride-10 window phases (A: even conv0 rows,
      B: odd).  a2_ref: (1, HALO, 10) — the next tile's first A rows.
    stats_ref: (1, 2, C) f32 — [shift, scale], GroupNorm affine folded:
      norm(y) == y * scale + shift.
    w0_ref: (10, C); w1_ref: (3, C, C); out_ref: (1, TILE, C).
    """
    shift = stats_ref[0, 0, :][None, :]
    scale = stats_ref[0, 1, :][None, :]

    def conv0_norm_gelu(windows):
        y = jnp.dot(windows, w0_ref[:], preferred_element_type=jnp.float32)
        y = y * scale + shift
        return jax.nn.gelu(y, approximate=gelu_approx)  # f32

    ya32 = conv0_norm_gelu(a_ref[0])          # conv0 rows 2r   (TILE, C) f32
    yb = conv0_norm_gelu(b_ref[0]).astype(w1_ref.dtype)   # rows 2r+1
    yh32 = conv0_norm_gelu(a2_ref[0])         # rows 2r+2 halo  (HALO, C)
    # rows 2r+2 = A[r+1]: ya rotated up one row with the last row replaced
    # by the halo's first.  roll+select in f32 (Mosaic rejects concatenating
    # sublane-offset slices, and tpu.dynamic_rotate only handles 32-bit).
    rows = jax.lax.broadcasted_iota(jnp.int32, ya32.shape, 0)
    yc = jnp.where(
        rows == ya32.shape[0] - 1,
        jnp.broadcast_to(yh32[:1], ya32.shape),
        pltpu.roll(ya32, shift=ya32.shape[0] - 1, axis=0),  # circular -1
    ).astype(w1_ref.dtype)
    ya = ya32.astype(w1_ref.dtype)

    y1 = jnp.dot(ya, w1_ref[0], preferred_element_type=jnp.float32)
    y1 += jnp.dot(yb, w1_ref[1], preferred_element_type=jnp.float32)
    y1 += jnp.dot(yc, w1_ref[2], preferred_element_type=jnp.float32)
    y1 = jax.nn.gelu(y1, approximate=gelu_approx)
    out_ref[0] = y1.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "gelu_approx", "interpret"))
def fused_conv01(
    waveform: jax.Array,
    w0: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    w1: jax.Array,
    *,
    eps: float = 1e-5,
    gelu_approx: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """conv0(k10,s5) -> GroupNorm(C groups) -> GELU -> conv1(k3,s2) -> GELU.

    Args:
      waveform: (B, L) float; w0: (10, 1, C); w1: (3, C, C) (TF layout);
      gamma/beta: (C,) GroupNorm affine.
    Returns:
      (B, T1, C) in bf16, T1 = conv output length of the two layers.
    """
    b, l = waveform.shape
    c = w0.shape[-1]
    t0 = 1 + (l - 10) // 5
    t1 = 1 + (t0 - 3) // 2

    n_tiles = -(-t1 // TILE)
    t1p = n_tiles * TILE
    # phase arrays span a whole extra TILE so the halo reads and the
    # stats-kernel grid share one (B, R, 10) tiling
    r = t1p + TILE

    # --- window phases: pure reshapes of the zero-padded waveform ---------
    pad_len = 10 * r + 15
    x = jnp.pad(waveform.astype(jnp.bfloat16), ((0, 0), (0, pad_len - l)))
    pa = x[:, : 10 * r].reshape(b, r, 10)
    pb = x[:, 5 : 5 + 10 * r].reshape(b, r, 10)

    # --- exact GroupNorm statistics from sufficient stats ------------------
    # valid conv0 rows: A rows [0, ceil(t0/2)), B rows [0, t0//2); rows past
    # those counts (waveform tail + zero padding) are masked in-kernel
    na, nb = (t0 + 1) // 2, t0 // 2
    w0f = w0.reshape(10, c).astype(jnp.float32)
    gram, row_sum = _window_stats(pa, pb, na, nb, interpret)
    mean = (row_sum @ w0f) / t0  # (B, C)
    sumsq = jnp.einsum("bjk,jc,kc->bc", gram, w0f, w0f)
    # E[y^2] - mean^2 cancels catastrophically in f32 when a channel's mean
    # dominates its variance (periodic/DC-heavy audio): the difference can
    # come out slightly negative and rsqrt then produces NaN.  Clamp to 0 —
    # eps dominates in exactly that regime, matching group_norm semantics.
    var = jnp.maximum(sumsq / t0 - mean * mean, 0.0)
    scale = jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)[None, :]
    shift = beta.astype(jnp.float32)[None, :] - mean * scale
    stats = jnp.stack([shift, scale], axis=1)  # (B, 2, C)

    out = pl.pallas_call(
        functools.partial(_kernel, gelu_approx=gelu_approx),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, 10), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 10), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            # halo: next tile's first A rows, at HALO-row block granularity
            pl.BlockSpec(
                (1, HALO, 10),
                lambda i, t: (i, (t + 1) * (TILE // HALO), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 2, c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c, c), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, c), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t1p, c), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t1p * (2 * 10 * c + 3 * c * c),
            bytes_accessed=b * (2 * 10 * t1p * 2 + t1p * c * 2),
            transcendentals=3 * b * t1p * c,
        ),
        interpret=interpret,
    )(
        pa,
        pb,
        pa,  # halo reads come from the A phase array itself
        stats,
        w0.reshape(10, c).astype(jnp.bfloat16),
        w1.astype(jnp.bfloat16),
    )
    return out[:, :t1, :]


@functools.partial(jax.jit, static_argnames=("eps", "gelu_approx", "interpret"))
def fused_conv01_robust(
    waveform: jax.Array,
    w0: jax.Array,
    b0: jax.Array,
    gamma0: jax.Array,
    beta0: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    gamma1: jax.Array,
    beta1: jax.Array,
    *,
    eps: float = 1e-5,
    gelu_approx: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Robust/large-family front end:
    conv0(k10,s5)+bias -> LayerNorm -> GELU -> conv1(k3,s2)+bias -> LayerNorm
    -> GELU.  Same window-phase decomposition as `fused_conv01`; LayerNorm
    is per-frame so there is no statistics pass at all.
    """
    b, l = waveform.shape
    c = w0.shape[-1]
    t0 = 1 + (l - 10) // 5
    t1 = 1 + (t0 - 3) // 2

    n_tiles = -(-t1 // TILE)
    t1p = n_tiles * TILE
    r = t1p + TILE

    pad_len = 10 * r + 15
    x = jnp.pad(waveform.astype(jnp.bfloat16), ((0, 0), (0, pad_len - l)))
    pa = x[:, : 10 * r].reshape(b, r, 10)
    pb = x[:, 5 : 5 + 10 * r].reshape(b, r, 10)

    def pack(bias, gamma, beta):
        return jnp.stack(
            [bias, gamma, beta, jnp.zeros_like(bias)], axis=0
        ).astype(jnp.float32)[None]  # (1, 4, C)

    out = pl.pallas_call(
        functools.partial(_kernel_robust, gelu_approx=gelu_approx, eps=eps),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, 10), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 10), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, HALO, 10),
                lambda i, t: (i, (t + 1) * (TILE // HALO), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 4, c), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, c), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c, c), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, c), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t1p, c), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t1p * (2 * 10 * c + 3 * c * c),
            bytes_accessed=b * (2 * 10 * t1p * 2 + t1p * c * 2),
            transcendentals=3 * b * t1p * c,
        ),
        interpret=interpret,
    )(
        pa,
        pb,
        pa,
        pack(b0, gamma0, beta0),
        pack(b1, gamma1, beta1),
        w0.reshape(10, c).astype(jnp.bfloat16),
        w1.astype(jnp.bfloat16),
    )
    return out[:, :t1, :]


def _geometry_ok(config) -> bool:
    return (
        len(config.kernal_sizes) >= 2
        and config.kernal_sizes[0] == 10
        and config.strides[0] == 5
        and config.kernal_sizes[1] == 3
        and config.strides[1] == 2
        and config.filter_sizes[0] == config.filter_sizes[1]
        and config.filter_sizes[0] % 128 == 0
    )


def supports(config, training: bool, frozen: bool = False) -> bool:
    """Both conv-stack families: base (GroupNorm on layer 0, no bias —
    `fused_conv01`) and robust/large/XLSR (LayerNorm every layer, biases —
    `fused_conv01_robust`).  No custom VJP, so in training the kernel is
    only eligible when the front-end is frozen (the reference recipe,
    `main.py:236-237`) and a stop_gradient cuts autodiff at its output —
    which also makes training and evaluation compute features through the
    SAME code path."""
    import os

    if os.environ.get("W2V2_FUSED_CONV", "1") == "0" or (
        training and not frozen
    ) or not _geometry_ok(config):
        return False
    if config.feature_extractor_norm_type == "group":
        return not config.conv_bias
    # robust variant: ON by default since round 3 — re-measured at the
    # large-model shape (B=8 x 246000 bf16, v5e) it now beats XLA 48.0 vs
    # 50.0 ms/forward (RTF 2562 vs 2462); round 2's 1.5%-behind result
    # predated the in-Pallas statistics work.  W2V2_FUSED_CONV_ROBUST=0
    # forces the XLA path.
    return (
        config.feature_extractor_norm_type == "layer"
        and os.environ.get("W2V2_FUSED_CONV_ROBUST", "1") != "0"
    )
