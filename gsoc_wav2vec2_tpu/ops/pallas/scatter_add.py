"""Row scatter-add as one-hot matmuls — the negatives-gather VJP.

The pretraining contrastive loss gathers K distractor rows per frame from
the quantized-target table (`models/pretraining.py::pretraining_loss`,
`q.reshape(b*l, d)[flat_idx]`).  The gather itself is the one shape TPUs
do well (flat-index row gather of contiguous D-vectors), but its autodiff
VJP is a scatter-add of 614k (D,)-rows with duplicate indices, which XLA
lowers to a serialized loop: measured **7.3 ms/step** of the 90 ms
pretraining step on v5e (the single largest loss-side op, HLO
`transpose(jvp())/scatter-add`).

This kernel computes the identical contraction as a sum of one-hot
matmuls that the MXU executes at full rate:

    out[j] = sum_n [idx[n] == j] * dneg[n]
           = sum_chunks  M_c^T @ dneg_c,   M_c[j, n] = (idx_c[n] == j)

One (L, C) selection tile is built per chunk from a broadcasted iota
compared against the chunk's indices (VPU), then contracted against the
chunk's (C, D) cotangent rows (MXU) into an (L, D) f32 accumulator that
revisits VMEM across the chunk axis.  At B=8/L=768/K=100/D=256 that is
242 GFLOP of bf16 dots (~1.3 ms) replacing the serialized scatter.
Indices are LOCAL to each batch row (negatives are drawn within the same
utterance), so the accumulator never exceeds (L, D) regardless of B.

Exactness: M is an exact 0/1 matrix in bf16; dneg is cast to bf16 for the
dot (f32 accumulation), so each addend rounds to bf16 — the same precision
every other gradient matmul in the model runs at (the XLA scatter path
accumulates the f32 cotangent exactly; CPU tests keep that path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 768  # cotangent rows per grid step; (L, CHUNK) bf16 tile = 1.2 MB


def _scatter_kernel(dneg_ref, idx_ref, out_ref, *, l_rows: int):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    idx = idx_ref[0]  # (1, C) int32, local row ids in [0, l_rows)
    # M^T[j, n] = (idx[n] == j): selection tile, exact 0/1 in bf16
    iota = jax.lax.broadcasted_iota(jnp.int32, (l_rows, idx.shape[-1]), 0)
    m_t = (iota == idx).astype(jnp.bfloat16)
    out_ref[0] += jax.lax.dot_general(
        m_t, dneg_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("l_rows", "interpret"))
def scatter_rows_add(
    dneg: jax.Array,
    idx_local: jax.Array,
    *,
    l_rows: int,
    interpret: bool = False,
) -> jax.Array:
    """sum_n one_hot(idx_local[b, n], l_rows) * dneg[b, n]  per batch row.

    Args:
      dneg: (B, N, D) cotangent rows (any float dtype; accumulated in f32).
      idx_local: (B, N) int32 destination rows, each in [0, l_rows).
    Returns (B, l_rows, D) float32.
    """
    # Mosaic only compiles for TPU; every other backend runs the
    # interpreter (tests exercise the same kernel program there)
    interpret = interpret or jax.default_backend() != "tpu"
    b, n, d = dneg.shape
    nc = -(-n // CHUNK)
    npad = nc * CHUNK - n
    if npad:
        dneg = jnp.pad(dneg, ((0, 0), (0, npad), (0, 0)))
        # padded rows carry zero cotangent, their index value is irrelevant
        idx_local = jnp.pad(idx_local, ((0, 0), (0, npad)))
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, l_rows=l_rows),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, CHUNK, d), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda i, c: (i, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l_rows, d), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l_rows, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nc * CHUNK * l_rows * d,
            bytes_accessed=dneg.size * dneg.dtype.itemsize
            + b * l_rows * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dneg, idx_local.reshape(b, 1, nc * CHUNK).astype(jnp.int32))
    return out


def supports(l_rows: int, d: int) -> bool:
    """VMEM check: (L, CHUNK) bf16 selection tile + (L, D) f32 accumulator
    + (CHUNK, D) input block must fit scoped VMEM comfortably."""
    vmem = l_rows * CHUNK * 2 + l_rows * d * 4 + CHUNK * d * 4
    return vmem < 8 * 2**20 and d % 128 == 0 and l_rows % 8 == 0
