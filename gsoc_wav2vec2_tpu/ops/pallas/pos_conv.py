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

Training support (custom VJP, `pos_conv_fused_train`): the backward pass
is two more instances of the SAME im2col structure —
  * dx is a full correlation of dpre with the tap-flipped, in/out-swapped
    kernel (stride 1, pad (k//2-1, k//2)), i.e. the forward kernel minus
    bias/GELU with transformed weights;
  * dW per group is win^T @ dpre — the window matrix rebuilt with the
    identical roll sequence, contracted over time (depth 768) into
    (K*CG, CG) blocks, accumulated over the batch grid axis in f32.
The pre-activation is saved from the forward (f32, grouped layout) so the
GELU derivative is exact; stage 2 of the recipe (pos conv trainable) then
never touches XLA's skinny grouped-conv lowering in either direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAP_BLOCK = 16  # taps folded per partial matmul

# The window super-block is assembled whole per (batch, group) grid step, so
# scoped VMEM scales linearly with T: ~5 KB/row at CG=48 (16 f32 roll tiles
# + the concatenated (rows, TAP_BLOCK*CG) window + its bf16 cast).  The
# 16 MB scoped-vmem ceiling lands at ~3100 rows (measured: T=8192 rejects
# with a 41.86M allocation); 2048 output frames (rows <= 2176, ~11 MB)
# keeps comfortable margin.  Past the cap `pos_conv_embed` falls back to
# XLA's grouped conv — linear in T and dwarfed by O(L^2) attention at the
# lengths that exceed it.
MAX_T = 2048


def supports_length(t: int) -> bool:
    """Whether the fused kernels fit scoped VMEM at `t` output frames."""
    return t <= MAX_T


# Time-blocked driver tile: each chunk spans <= BLOCK_T + K input frames
# (= MAX_T at K=128), so every per-chunk kernel call stays inside the
# measured VMEM envelope above regardless of total sequence length.
BLOCK_T = MAX_T - 128


def pos_conv_blocked(
    x: jax.Array,
    kernel: jax.Array,
    bias,
    *,
    kernel_size: int,
    groups: int,
    gelu_approx: bool = False,
    interpret: bool = False,
    training: bool = False,
    block_t: int = BLOCK_T,
) -> jax.Array:
    """`pos_conv_fused(_train)` at ANY length via time tiles with halos.

    Output rows [t0, t1) need input rows [t0 - K/2, t1 + K/2 - 1), so each
    tile's kernel call receives `block_t` output frames plus a halo of
    K/2 REAL neighbour frames on each side and the valid rows are cropped
    out.  Interior rows see exactly the unblocked kernel's products in the
    same tap-block accumulation order — outputs are bitwise identical to
    the unblocked kernel; global sequence edges hit the per-chunk zero
    padding, which is again exactly the unblocked (and XLA) semantics.

    This lifts the `MAX_T` VMEM cap for the long-sequence training path
    (VERDICT r4 #4: the 8192-frame optimizer step previously fell back to
    XLA's skinny grouped conv).  Cost: the halo recompute, K/block_t ~ 7%
    extra MACs.  Gradients compose exactly: each chunk runs the custom-VJP
    kernel and the overlapping slice cotangents sum in XLA.
    """
    b, t, c = x.shape
    k = kernel_size
    h = k // 2
    assert block_t % 64 == 0 and block_t + k <= MAX_T + 64
    fn = pos_conv_fused_train if training else pos_conv_fused
    outs = []
    for t0 in range(0, t, block_t):
        t1 = min(t0 + block_t, t)
        lo = max(0, t0 - h)
        hi = min(t, t1 + h)
        out = fn(
            x[:, lo:hi], kernel, bias,
            kernel_size=k, groups=groups,
            gelu_approx=gelu_approx, interpret=interpret,
        )
        outs.append(out[:, t0 - lo : t1 - lo])
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _window(x_ref):
    """Assemble the (rows, TAP_BLOCK*CG) window super-block in VMEM.

    Columns j=0..15 are 1-row-shifted copies of x (pltpu.roll takes
    non-negative shifts: rows-1 == circular -1; the wrapped rows land past
    row t_out+k-16 and are never read by the dots).  Tap block jb is then
    just this block shifted 16*jb rows — a sublane-ALIGNED slice (16 == the
    bf16 sublane tile), which Mosaic takes directly as a dot operand: no
    further data movement at all.  Rolls must be f32 (Mosaic: "Rotate with
    non-32-bit data"); the window is cast to bf16 ONCE after assembly.
    """
    x = x_ref[0, 0].astype(jnp.float32)  # (rows, CG)
    rows = x.shape[0]
    cols = [x]
    for _ in range(TAP_BLOCK - 1):
        cols.append(pltpu.roll(cols[-1], shift=rows - 1, axis=0))
    return jnp.concatenate(cols, axis=1).astype(jnp.bfloat16)


def _conv_acc(win, w_ref, t_out: int, k: int, cg: int):
    """Sum of per-tap-block matmuls: (t_out, K*CG-deep) grouped conv."""
    acc = jnp.zeros((t_out, cg), jnp.float32)
    for jb in range(k // TAP_BLOCK):
        wb = w_ref[0, jb * TAP_BLOCK * cg : (jb + 1) * TAP_BLOCK * cg, :]
        acc += jax.lax.dot_general(
            win[jb * TAP_BLOCK : jb * TAP_BLOCK + t_out],
            wb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _kernel(x_ref, w_ref, b_ref, out_ref, *, t_out: int, k: int, cg: int,
            gelu_approx: bool):
    """x_ref: (1, 1, T+K, CG); w_ref: (1, K*CG, CG); b_ref: (1, 8, CG)
    (row-broadcast bias); out: (1, 1, T, CG)."""
    win = _window(x_ref)
    acc = _conv_acc(win, w_ref, t_out, k, cg)
    acc = acc + b_ref[0, 0, :][None, :]
    acc = jax.nn.gelu(acc, approximate=gelu_approx)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _fwd_train_kernel(x_ref, w_ref, b_ref, out_ref, pre_ref, *, t_out: int,
                      k: int, cg: int, gelu_approx: bool):
    """Forward that also emits the f32 pre-activation (GELU' residual)."""
    win = _window(x_ref)
    acc = _conv_acc(win, w_ref, t_out, k, cg)
    acc = acc + b_ref[0, 0, :][None, :]
    pre_ref[0, 0] = acc
    out_ref[0, 0] = jax.nn.gelu(acc, approximate=gelu_approx).astype(out_ref.dtype)


def _linear_kernel(x_ref, w_ref, out_ref, *, t_out: int, k: int, cg: int):
    """Grouped im2col conv, no bias/activation — the dx correlation."""
    win = _window(x_ref)
    out_ref[0, 0] = _conv_acc(win, w_ref, t_out, k, cg).astype(out_ref.dtype)


def _dw_kernel(x_ref, dpre_ref, dw_ref, *, t_out: int, k: int, cg: int):
    """dW_g += win_g^T @ dpre_g, accumulated over the (inner) batch axis.

    Each tap block contracts (t_out, TAP_BLOCK*CG)^T with (t_out, CG) —
    depth t_out (768 at the recipe shape), a well-shaped MXU pass; the
    (K*CG, CG) accumulator block revisits the same output position for
    every batch step (standard Pallas revisit-accumulate).
    """
    i = pl.program_id(1)  # batch (inner, sequential)
    win = _window(x_ref)
    dpre = dpre_ref[0, 0].astype(jnp.bfloat16)  # (t_out, CG)

    @pl.when(i == 0)
    def _init():
        dw_ref[0] = jnp.zeros_like(dw_ref[0])

    for jb in range(k // TAP_BLOCK):
        dw_ref[0, jb * TAP_BLOCK * cg : (jb + 1) * TAP_BLOCK * cg, :] += (
            jax.lax.dot_general(
                win[jb * TAP_BLOCK : jb * TAP_BLOCK + t_out],
                dpre,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )


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


# ---------------------------------------------------------------------------
# Training path (custom VJP)
# ---------------------------------------------------------------------------


def _pad_rows(xg: jax.Array, k: int, pad_lo: int):
    """(B, G, T, CG) -> (B, G, rows, CG) bf16, zero-padded `pad_lo` on the
    left and up to a 64-row multiple on the right (the roll-based window
    assembly needs tile-aligned row counts — see `pos_conv_fused`)."""
    b, g, t, cg = xg.shape
    rows = -(-(t + k) // 64) * 64
    return (
        jnp.pad(xg, ((0, 0), (0, 0), (pad_lo, rows - t - pad_lo), (0, 0)))
        .astype(jnp.bfloat16),
        rows,
    )


def _group(x: jax.Array, g: int):
    b, t, c = x.shape
    return x.reshape(b, t, g, c // g).transpose(0, 2, 1, 3)


def _ungroup(xg: jax.Array):
    b, g, t, cg = xg.shape
    return xg.transpose(0, 2, 1, 3).reshape(b, t, g * cg)


def _fwd_train_call(x, kernel, bias, *, k: int, g: int, gelu_approx: bool,
                    interpret: bool):
    b, t, c = x.shape
    cg = c // g
    xg, rows = _pad_rows(_group(x, g), k, k // 2)
    wg = (
        kernel.reshape(k, cg, g, cg)
        .transpose(2, 0, 1, 3)
        .reshape(g, k * cg, cg)
        .astype(jnp.bfloat16)
    )
    bg = jnp.broadcast_to(
        bias.astype(jnp.float32).reshape(g, 1, cg), (g, 8, cg)
    )
    out, pre = pl.pallas_call(
        functools.partial(
            _fwd_train_kernel, t_out=t, k=k, cg=cg, gelu_approx=gelu_approx
        ),
        grid=(g, b),
        in_specs=[
            pl.BlockSpec((1, 1, rows, cg), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * cg, cg), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cg), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, t, cg), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, cg), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, g, t, cg), x.dtype),
            jax.ShapeDtypeStruct((b, g, t, cg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * k * cg * c,
            bytes_accessed=b * (t + k) * c * 2 + b * t * c * 6,
            transcendentals=b * t * c,
        ),
        interpret=interpret,
    )(xg, wg, bg)
    return _ungroup(out), pre


def _dx_call(dpre, kernel, x_dtype, *, k: int, g: int, interpret: bool):
    """dx = correlate(dpre, flip-and-swap(kernel)): the forward kernel with
    pad (k//2 - 1, ...) and rows ordered (tap', out-channel)."""
    b, _, t, cg = dpre.shape
    c = g * cg
    dg, rows = _pad_rows(dpre, k, k // 2 - 1)
    wk = (
        kernel.reshape(k, cg, g, cg)[::-1]
        .transpose(2, 0, 3, 1)
        .reshape(g, k * cg, cg)
        .astype(jnp.bfloat16)
    )
    out = pl.pallas_call(
        functools.partial(_linear_kernel, t_out=t, k=k, cg=cg),
        grid=(g, b),
        in_specs=[
            pl.BlockSpec((1, 1, rows, cg), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * cg, cg), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, cg), lambda j, i: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, g, t, cg), x_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * k * cg * c,
            bytes_accessed=b * (t + k) * c * 2 + b * t * c * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dg, wk)
    return _ungroup(out)


def _dw_call(x, dpre, *, k: int, g: int, interpret: bool):
    """dW_g = sum_b win_g(b)^T @ dpre_g(b), f32 accumulated in VMEM."""
    b, t, c = x.shape
    cg = c // g
    xg, rows = _pad_rows(_group(x, g), k, k // 2)
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, t_out=t, k=k, cg=cg),
        grid=(g, b),
        in_specs=[
            pl.BlockSpec((1, 1, rows, cg), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, cg), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # the accumulator block revisits (j, 0, 0) for every batch step
        out_specs=pl.BlockSpec((1, k * cg, cg), lambda j, i: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, k * cg, cg), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * k * cg * c,
            bytes_accessed=b * (t + k) * c * 2 + b * t * c * 2 + k * c * cg * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xg, dpre.astype(jnp.bfloat16))
    # (G, (tap, ci), co) -> kernel layout (tap, ci, C)
    return dw.reshape(g, k, cg, cg).transpose(1, 2, 0, 3).reshape(k, cg, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _train_core(x, kernel, bias, kernel_size, groups, gelu_approx, interpret):
    y, _ = _fwd_train_call(
        x, kernel, bias, k=kernel_size, g=groups, gelu_approx=gelu_approx,
        interpret=interpret,
    )
    return y


def _train_fwd(x, kernel, bias, kernel_size, groups, gelu_approx, interpret):
    y, pre = _fwd_train_call(
        x, kernel, bias, k=kernel_size, g=groups, gelu_approx=gelu_approx,
        interpret=interpret,
    )
    return y, (x, kernel, bias, pre)


def _train_bwd(kernel_size, groups, gelu_approx, interpret, res, dy):
    x, kernel, bias, pre = res  # pre: (B, G, T, CG) f32
    b, t, c = x.shape
    g, k = groups, kernel_size
    cg = c // g

    dy_g = _group(dy, g).astype(jnp.float32)
    _, gelu_vjp = jax.vjp(
        lambda p: jax.nn.gelu(p, approximate=gelu_approx), pre
    )
    (dpre,) = gelu_vjp(dy_g)  # exact GELU' from the saved pre-activation

    db = jnp.sum(dpre, axis=(0, 2)).reshape(c).astype(bias.dtype)
    dx = _dx_call(dpre, kernel, x.dtype, k=k, g=g, interpret=interpret)
    dk = _dw_call(x, dpre, k=k, g=g, interpret=interpret).astype(kernel.dtype)
    return dx, dk, db


_train_core.defvjp(_train_fwd, _train_bwd)


def pos_conv_fused_train(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    kernel_size: int,
    groups: int,
    gelu_approx: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable `pos_conv_fused`: same forward contract, custom VJP.

    All three gradients (dx, dkernel, dbias) are exact up to bf16 matmul
    precision; the weight-norm decomposition differentiates outside in XLA
    (`ops/conv.py::weight_norm_kernel` is plain jnp).  Single-device only —
    under a multi-device mesh the caller keeps the XLA path (GSPMD cannot
    partition the custom call, and shard_map autodiff with replicated
    kernel operands would need hand-written psums here).
    """
    b, t, c = x.shape
    k, cg, _ = kernel.shape
    assert k == kernel_size and cg == c // groups and k % TAP_BLOCK == 0
    return _train_core(
        x, kernel, bias, kernel_size, groups, gelu_approx, interpret
    )
