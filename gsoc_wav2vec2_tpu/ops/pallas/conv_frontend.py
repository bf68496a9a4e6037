"""Fused conv front-end Pallas kernel (layers 0+1 of the feature encoder).

The wav2vec2-base front-end opens with
    conv0 (k=10, s=5, 1->512ch) -> GroupNorm(512 groups == instance norm
    over time) -> GELU -> conv1 (k=3, s=2, 512->512) -> GELU
(reference `/root/reference/src/wav2vec2/feature_extractor.py:6-59`).

XLA executes this as four HBM round-trips over the (B, 49199, 512)
intermediate (~400 MB each way at the 246000-sample eval shape) — measured
4.8 ms of a 19.9 ms forward on v5e.  Two observations make it collapse:

1. **conv0 is linear and FLOP-trivial** (C_in = 1), so its output never
   needs to exist in HBM.  GroupNorm statistics are computed EXACTLY on the
   host-graph side from sufficient statistics of the sample windows:
   per-channel mean is `(Σ_t window_t) @ W0 / T`, and per-channel sum of
   squares is `diag(W0ᵀ G W0)` with the tiny Gram matrix
   `G = Σ_t window_t window_tᵀ` (10×10) — ~13 MB of reads instead of a
   400 MB materialise + re-read.
2. conv1 (k=3, s=2) decomposes into three stride-phases: output row r needs
   conv0 rows 2r, 2r+1, 2r+2, i.e. three INDEPENDENT window streams
   A/B/C with `A[r] = x[10r:10r+10]`, `B[r] = x[10r+5:10r+15]`,
   `C[r] = x[10r+10:10r+20]`.  The kernel streams (16, TILE) tiles of each
   phase, recomputes the three conv0 row sets on the MXU, normalises +
   GELUs in VMEM, and accumulates `Σ_j gelu(norm(phase_j @ W0)) @ W1[j]` —
   no halo exchange, no concatenation, no conv0 output in HBM, ever.

HBM traffic: window phases ~19 MB + conv1 output write ~200 MB (vs ~1.6 GB).
GroupNorm statistics are population mean/variance in f32, matching
`ops/basic.group_norm`.

Inference-path only (no custom VJP yet) — training keeps the XLA path,
where the conv stack is frozen by the reference recipe anyway
(`main.py:236-237`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # conv1 output rows per grid step


def _kernel(a_ref, b_ref, c_ref, stats_ref, w0_ref, w1_ref, out_ref,
            *, gelu_approx: bool):
    """Grid: (B, T1p // TILE).

    a/b/c_ref: (1, TILE, 16) window phases (one conv0 row set per conv1 row).
    stats_ref: (1, 2, C) f32 — [shift, scale] with the GroupNorm affine
      folded in: norm(y) == y * scale + shift.
    w0_ref: (16, C); w1_ref: (3, C, C); out_ref: (1, TILE, C).
    """
    shift = stats_ref[0, 0, :][None, :]
    scale = stats_ref[0, 1, :][None, :]

    def branch(phase_ref, w1_slice, acc):
        y0 = jnp.dot(
            phase_ref[0], w0_ref[:], preferred_element_type=jnp.float32
        )  # (TILE, C)
        y0 = y0 * scale + shift  # GroupNorm with gamma/beta pre-folded
        y0 = jax.nn.gelu(y0, approximate=gelu_approx).astype(w1_slice.dtype)
        y1 = jnp.dot(y0, w1_slice, preferred_element_type=jnp.float32)
        return acc + y1 if acc is not None else y1

    y1 = branch(a_ref, w1_ref[0], None)
    y1 = branch(b_ref, w1_ref[1], y1)
    y1 = branch(c_ref, w1_ref[2], y1)
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

    # --- window phases: pure reshapes, no strided slicing ----------------
    pad_len = 10 * t1p + 20
    x = jnp.pad(waveform.astype(jnp.bfloat16), ((0, 0), (0, pad_len - l)))
    r = jnp.arange(t1p)

    def phase(offset, valid_rows):
        # phase[r] = x[10r + offset : 10r + offset + 10] — contiguous groups
        ph = x[:, offset : offset + 10 * t1p].reshape(b, t1p, 10)
        ph = jnp.where((r < valid_rows)[None, :, None], ph, 0)
        return jnp.pad(ph, ((0, 0), (0, 0), (0, 6)))  # window dim -> 16 lanes

    # conv0 row indices: A -> 2r, B -> 2r+1, C -> 2r+2 (valid while < T0)
    pa = phase(0, (t0 + 1) // 2)
    pb = phase(5, t0 // 2)
    pc = phase(10, (t0 - 1) // 2)

    # --- exact GroupNorm statistics from sufficient stats ----------------
    w0f = w0.reshape(10, c).astype(jnp.float32)
    row_sum = (
        jnp.sum(pa, axis=1, dtype=jnp.float32)
        + jnp.sum(pb, axis=1, dtype=jnp.float32)
    )[:, :10]  # (B, 10): Σ_t window_t over ALL t0 rows (A: even, B: odd)
    mean = (row_sum @ w0f) / t0  # (B, C)
    ab = jnp.concatenate([pa, pb], axis=1)  # (B, 2T, 16) bf16
    gram = jnp.einsum(
        "btj,btk->bjk", ab[..., :10], ab[..., :10],
        preferred_element_type=jnp.float32,
    )  # (B, 10, 10)
    sumsq = jnp.einsum("bjk,jc,kc->bc", gram, w0f, w0f)
    var = sumsq / t0 - mean * mean
    scale = jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)[None, :]
    shift = beta.astype(jnp.float32)[None, :] - mean * scale
    # affine folded: norm(y) == y * scale + shift
    stats = jnp.stack([shift, scale], axis=1)  # (B, 2, C)

    w0p = jnp.pad(w0.reshape(10, c), ((0, 6), (0, 0))).astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_kernel, gelu_approx=gelu_approx),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, 16), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 16), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 16), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c, c), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, c), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t1p, c), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t1p * (3 * 16 * c + 3 * c * c),
            bytes_accessed=b * (3 * 16 * t1p * 2 + t1p * c * 2),
            transcendentals=4 * b * t1p * c,
        ),
        interpret=interpret,
    )(pa, pb, pc, stats, w0p, w1.astype(jnp.bfloat16))
    return out[:, :t1, :]


def supports(config, training: bool) -> bool:
    """Base-family geometry only; inference path only (no VJP).

    Currently opt-in (W2V2_FUSED_CONV=1): on v5e the measured total
    (2.95 ms XLA-side phase prep + 4.30 ms kernel) does not yet beat XLA's
    6.46 ms for the whole 7-layer stack — the stride-phase recompute does
    1.5x the skinny conv0 matmul work and the prep's masking/padding passes
    erase the HBM savings.  Kept (tested, bit-accurate: max diff 7e-4 vs
    the XLA path on TPU) as the base for a future tuned version; the
    win is in reducing skinny-dot work via interleaved even/odd row
    computation and folding the masking into the kernel.
    """
    import os

    return (
        os.environ.get("W2V2_FUSED_CONV") == "1"
        and not training
        and config.feature_extractor_norm_type == "group"
        and not config.conv_bias
        and len(config.kernal_sizes) >= 2
        and config.kernal_sizes[0] == 10
        and config.strides[0] == 5
        and config.kernal_sizes[1] == 3
        and config.strides[1] == 2
        and config.filter_sizes[0] == config.filter_sizes[1]
        and config.filter_sizes[0] % 128 == 0
    )
