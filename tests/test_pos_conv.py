"""Fused grouped positional-conv kernel parity vs the XLA path.

Runs in interpreter mode on CPU; compiled-mode parity on the real TPU was
verified at T=768/1249/155 (max err at bf16 ulp scale).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu.ops.conv import (
    init_weight_g,
    pos_conv_embed,
    weight_norm_kernel,
)
from gsoc_wav2vec2_tpu.ops.pallas.pos_conv import pos_conv_fused


def _setup(t, c=256, g=16, k=128, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (2, t, c), jnp.float32) * 0.5
    wv = jax.random.normal(k2, (k, c // g, c), jnp.float32) * 0.05
    params = {
        "weight_v": wv,
        "weight_g": init_weight_g(wv),
        "bias": 0.1 * jax.random.normal(k3, (c,), jnp.float32),
    }
    return x, params


@pytest.mark.parametrize("t", [256, 155])
def test_pos_conv_fused_matches_xla(t):
    """Even-kernel crop, symmetric padding, bias-before-GELU, grouped
    channels — all at once, incl. a non-tile-aligned length (the
    50000-sample export shape gives T=155)."""
    g, k = 16, 128
    x, params = _setup(t)
    want = np.asarray(
        pos_conv_embed(x, params, k, g, True), np.float32
    )
    kernel = weight_norm_kernel(params["weight_v"], params["weight_g"])
    got = np.asarray(
        pos_conv_fused(
            x.astype(jnp.bfloat16), kernel, params["bias"],
            kernel_size=k, groups=g, gelu_approx=True, interpret=True,
        ),
        np.float32,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
    assert np.abs(got - want).mean() < 5e-3


def test_pos_conv_fused_no_bias():
    x, params = _setup(256, seed=1)
    params.pop("bias")
    kernel = weight_norm_kernel(params["weight_v"], params["weight_g"])
    want = np.asarray(pos_conv_embed(x, params, 128, 16, True), np.float32)
    got = np.asarray(
        pos_conv_fused(
            x.astype(jnp.bfloat16), kernel, None,
            kernel_size=128, groups=16, gelu_approx=True, interpret=True,
        ),
        np.float32,
    )
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
