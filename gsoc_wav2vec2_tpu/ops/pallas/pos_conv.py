"""Fused grouped positional-conv kernel (k=128, 16 groups, stride 1).

The positional embedding's grouped conv (reference `encoder.py:153-181`:
Conv1D(768, kernel 128, groups 16) at T=768) is XLA's single worst op in
the whole forward pass: ~4 ms of a 38 ms batch-16 inference step on v5e —
7% MXU utilisation, because XLA lowers each 48-channel group to skinny
contractions.

This kernel runs one (batch, group) block per grid step and performs the
im2col explicitly in VMEM: the (T, K*48) window matrix gives a contraction
depth of 6144, and the whole group reduces to ONE well-shaped matmul
(768 x 6144) @ (6144 x 48).  The window matrix is built incrementally —
16 single-row-shift rolls for the first 16-tap block, then one 16-row roll
per remaining block — so the VPU moves ~19 MB per grid step instead of
re-slicing x 128 times.  Mosaic rejects concatenations of sublane-offset
*slices*, which is why the shifts are `pltpu.roll`s of full tiles (same
trick as `conv_frontend.py`).

Inference-only (no VJP): in training the positional conv is trainable
(stage 2), so the XLA path is used there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAP_BLOCK = 16  # taps folded per partial matmul


def _kernel(x_ref, w_ref, b_ref, out_ref, *, t_out: int, k: int, cg: int,
            gelu_approx: bool):
    """x_ref: (1, 1, T+K, CG); w_ref: (1, K*CG, CG); b_ref: (1, 8, CG)
    (row-broadcast bias); out: (1, 1, T, CG)."""
    # rolls must be f32 (Mosaic: "Rotate with non-32-bit data"); the window
    # is cast to bf16 ONCE after assembly
    x = x_ref[0, 0].astype(jnp.float32)  # (T+K, CG)

    rows = x.shape[0]
    # one window super-block: columns j=0..15, each a 1-row-shifted copy of
    # x (pltpu.roll takes non-negative shifts: rows-1 == circular -1; the
    # wrapped rows land past row t_out+k-16 and are never read below).
    # Tap block jb is then just this block shifted 16*jb rows — a
    # sublane-ALIGNED slice (16 == the bf16 sublane tile), which Mosaic
    # takes directly as a dot operand: no further data movement at all.
    cols = [x]
    for _ in range(TAP_BLOCK - 1):
        cols.append(pltpu.roll(cols[-1], shift=rows - 1, axis=0))
    win = jnp.concatenate(cols, axis=1).astype(jnp.bfloat16)

    acc = jnp.zeros((t_out, cg), jnp.float32)
    n_blocks = k // TAP_BLOCK
    for jb in range(n_blocks):
        wb = w_ref[0, jb * TAP_BLOCK * cg : (jb + 1) * TAP_BLOCK * cg, :]
        acc += jax.lax.dot_general(
            win[jb * TAP_BLOCK : jb * TAP_BLOCK + t_out],
            wb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc + b_ref[0, 0, :][None, :]
    acc = jax.nn.gelu(acc, approximate=gelu_approx)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "groups", "gelu_approx", "interpret")
)
def pos_conv_fused(
    x: jax.Array,
    kernel: jax.Array,
    bias,
    *,
    kernel_size: int,
    groups: int,
    gelu_approx: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """GELU(grouped_conv1d(x, kernel, pad=k//2)[:, :-1]) for even kernels.

    Args:
      x: (B, T, C); kernel: (K, C // groups, C) TF WIO layout (already
        weight-norm recomposed); bias: (C,) or None.
    Returns (B, T, C) — the positional embedding (caller adds it to x).
    """
    b, t, c = x.shape
    k, cg, _ = kernel.shape
    g = groups
    assert k == kernel_size and cg == c // g and k % TAP_BLOCK == 0

    # (B, T, C) -> (B, G, rows, CG), zero-padded k//2 each side; rows are
    # rounded up to a sublane-tile multiple — otherwise the rolled tiles in
    # the kernel carry layout offsets Mosaic refuses to concatenate
    # ("result/input offset mismatch on non-concat dimension", seen at
    # T=155)
    xg = x.reshape(b, t, g, cg).transpose(0, 2, 1, 3)
    pad = k // 2
    rows = -(-(t + k) // 64) * 64
    xg = jnp.pad(
        xg, ((0, 0), (0, 0), (pad, rows - t - pad), (0, 0))
    ).astype(jnp.bfloat16)

    # kernel (K, CG, C): group g's output block is columns [g*CG, (g+1)*CG)
    # -> (G, K*CG, CG) with rows ordered (tap, in-channel)
    wg = (
        kernel.reshape(k, cg, g, cg)
        .transpose(2, 0, 1, 3)
        .reshape(g, k * cg, cg)
        .astype(jnp.bfloat16)
    )
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    bg = jnp.broadcast_to(
        bias.astype(jnp.float32).reshape(g, 1, cg), (g, 8, cg)
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, t_out=t, k=k, cg=cg, gelu_approx=gelu_approx
        ),
        # group is the OUTER grid dim: the (K*CG, CG) weight block then
        # stays resident across the whole inner batch sweep
        grid=(g, b),
        in_specs=[
            pl.BlockSpec((1, 1, rows, cg), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * cg, cg), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cg), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, cg), lambda j, i: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, g, t, cg), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * k * cg * c,
            bytes_accessed=b * (t + k) * c * 2 + b * t * c * 2,
            transcendentals=b * t * c,
        ),
        interpret=interpret,
    )(xg, wg, bg)

    return out.transpose(0, 2, 1, 3).reshape(b, t, c)
