"""Pallas flash-attention kernel parity vs the XLA einsum path.

Runs the kernel in interpreter mode on CPU (compiled-mode parity on a real
TPU is exercised by bench/verification runs; the interpreter executes the
same kernel program).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu.ops.attention import mask_to_bias, mha, mha_xla, split_heads
from gsoc_wav2vec2_tpu.ops.pallas.flash_attention import flash_attention, supports


def _qkv(rng, b=2, h=4, l=256, d=64, dtype=jnp.float32):
    keys = jax.random.split(rng, 3)
    shape = (b, h, l, d)
    return [jax.random.normal(k, shape, dtype) * 0.3 for k in keys]


def _reference(q, k, v, bias=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=q.dtype)


def test_flash_matches_reference_unmasked():
    q, k, v = _qkv(jax.random.PRNGKey(0))
    got = flash_attention(q, k, v, interpret=True)
    want = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_matches_reference_masked():
    q, k, v = _qkv(jax.random.PRNGKey(1), b=2, l=256)
    mask = np.ones((2, 256), np.float32)
    mask[0, 100:] = 0.0  # ragged batch
    mask[1, 200:] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))
    got = flash_attention(q, k, v, bias, interpret=True)
    want = _reference(q, k, v, bias)
    # only compare valid query rows (masked rows feed no downstream output)
    np.testing.assert_allclose(
        np.asarray(got)[0, :, :100], np.asarray(want)[0, :, :100], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got)[1, :, :200], np.asarray(want)[1, :, :200], atol=2e-5
    )


def test_flash_q_blocking_equivalent():
    q, k, v = _qkv(jax.random.PRNGKey(2), l=512)
    full = flash_attention(q, k, v, q_block=512, interpret=True)
    blocked = flash_attention(q, k, v, q_block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(blocked), atol=1e-6)


def test_flash_bf16():
    q, k, v = _qkv(jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    got = flash_attention(q, k, v, interpret=True).astype(jnp.float32)
    want = _reference(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_mha_flash_impl_matches_xla_impl():
    """Full attention block (q/k/v/out projections) through both paths."""
    rng = jax.random.PRNGKey(4)
    h_dim, heads, l = 128, 2, 256
    keys = jax.random.split(rng, 9)
    params = {
        name: {
            "kernel": jax.random.normal(keys[i], (h_dim, h_dim), jnp.float32) * 0.05,
            "bias": jax.random.normal(keys[i + 4], (h_dim,), jnp.float32) * 0.01,
        }
        for i, name in enumerate(["q_proj", "k_proj", "v_proj", "out_proj"])
    }
    x = jax.random.normal(keys[8], (2, l, h_dim), jnp.float32)

    want = mha_xla(x, params, heads)
    # route through the dispatcher with the kernel forced into interpret mode
    from gsoc_wav2vec2_tpu.ops import attention as attn_mod
    from gsoc_wav2vec2_tpu.ops.pallas import flash_attention as fa_mod
    import functools

    orig = fa_mod.flash_attention
    try:
        fa_mod.flash_attention = functools.partial(orig, interpret=True)
        got = mha(x, params, heads, impl="flash")
    finally:
        fa_mod.flash_attention = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_supports_gate():
    assert supports(768, 64, dropout_active=False)
    assert not supports(768, 64, dropout_active=True)   # prob-dropout -> XLA
    assert not supports(1249, 64, dropout_active=False)  # not 128-multiple
    assert not supports(8192, 64, dropout_active=False)  # too long for VMEM
