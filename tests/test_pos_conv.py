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


def test_pos_conv_train_grads_match_xla():
    """Custom-VJP path (fused forward + Pallas dx/dW/db) vs jax.grad
    through the XLA conv, interpret mode.  Covers all four parameter
    gradients (weight_v, weight_g via the weight-norm chain, bias) plus dx,
    at bf16 matmul tolerance."""
    from gsoc_wav2vec2_tpu.ops.pallas.pos_conv import pos_conv_fused_train

    g, k, t, c = 16, 128, 256, 256
    x, params = _setup(t)
    probe = jax.random.normal(jax.random.PRNGKey(9), (2, t, c), jnp.float32)

    def loss_ref(params, x):
        y = pos_conv_embed(x, params, k, g, True)  # XLA path on CPU
        return jnp.sum(y * probe)

    def loss_fused(params, x):
        kernel = weight_norm_kernel(params["weight_v"], params["weight_g"])
        y = pos_conv_fused_train(
            x.astype(jnp.bfloat16), kernel, params["bias"],
            kernel_size=k, groups=g, gelu_approx=True, interpret=True,
        )
        return jnp.sum(y.astype(jnp.float32) * probe)

    want = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    got = jax.grad(loss_fused, argnums=(0, 1))(params, x)

    flat_w, _ = jax.tree_util.tree_flatten_with_path(want)
    flat_g, _ = jax.tree_util.tree_flatten_with_path(got)
    for (path, w), (_, gg) in zip(flat_w, flat_g):
        w, gg = np.asarray(w, np.float32), np.asarray(gg, np.float32)
        assert w.shape == gg.shape, path
        scale = np.abs(w).mean() + 1e-6
        rel = np.abs(gg - w).mean() / scale
        assert rel < 0.05, f"{path}: mean rel err {rel:.4f}"
        # and no single catastrophic element
        assert np.abs(gg - w).max() / (np.abs(w).max() + 1e-6) < 0.2, path


def test_pos_conv_train_forward_matches_inference_kernel():
    """The train-variant forward must agree with the inference kernel
    bit-for-bit in interpret mode (same dots, same order)."""
    from gsoc_wav2vec2_tpu.ops.pallas.pos_conv import (
        pos_conv_fused,
        pos_conv_fused_train,
    )

    x, params = _setup(256, seed=3)
    kernel = weight_norm_kernel(params["weight_v"], params["weight_g"])
    a = pos_conv_fused(
        x.astype(jnp.bfloat16), kernel, params["bias"],
        kernel_size=128, groups=16, gelu_approx=True, interpret=True,
    )
    b = pos_conv_fused_train(
        x.astype(jnp.bfloat16), kernel, params["bias"],
        kernel_size=128, groups=16, gelu_approx=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_long_sequence_dispatches_to_blocked_driver(monkeypatch):
    """Past `pos_conv.MAX_T` the whole-T fused kernels overflow scoped
    VMEM (measured on v5e: T=8192 requests a 41.86M allocation against the
    16M ceiling), so `pos_conv_embed` must route long sequences through
    the time-blocked driver — in BOTH inference and training — and keep
    the whole-T kernel at or below the cap.  Biasless long-sequence
    training (no fused-train variant) stays on XLA."""
    import gsoc_wav2vec2_tpu.ops.conv as conv_mod
    import gsoc_wav2vec2_tpu.ops.pallas.pos_conv as pc

    assert pc.supports_length(pc.MAX_T)
    assert not pc.supports_length(pc.MAX_T + 1)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def whole_t_boom(*a, **k):
        raise AssertionError("whole-T fused pos-conv dispatched past MAX_T")

    def blocked_sentinel(*a, **k):
        raise AssertionError("blocked pos-conv dispatched")

    monkeypatch.setattr(pc, "pos_conv_fused", whole_t_boom)
    monkeypatch.setattr(pc, "pos_conv_fused_train", whole_t_boom)
    monkeypatch.setattr(pc, "pos_conv_blocked", blocked_sentinel)

    t = pc.MAX_T + 64
    g, k = 16, 128
    x, params = _setup(t, c=64, g=g, k=k)
    xb = x.astype(jnp.bfloat16)
    with pytest.raises(AssertionError, match="blocked pos-conv"):
        conv_mod.pos_conv_embed(xb, params, k, g, training=False)
    with pytest.raises(AssertionError, match="blocked pos-conv"):
        conv_mod.pos_conv_embed(xb, params, k, g, training=True)

    # biasless training past the cap: XLA fallback (no fused-train variant)
    params_nobias = dict(params)
    params_nobias.pop("bias")
    out = conv_mod.pos_conv_embed(xb, params_nobias, k, g, training=True)
    assert out.shape == (2, t, 64)

    # and AT the cap the whole-T fused path still dispatches
    x2, params2 = _setup(pc.MAX_T, c=64, g=g, k=k)
    with pytest.raises(AssertionError, match="whole-T fused"):
        conv_mod.pos_conv_embed(
            x2.astype(jnp.bfloat16), params2, k, g, training=False
        )


def test_pos_conv_blocked_bitwise_matches_unblocked():
    """The time-blocked driver must reproduce the whole-T kernel
    BIT-FOR-BIT: interior tile rows see the same products in the same
    tap-block accumulation order, and sequence edges hit the same zero
    padding.  Forced multi-tile via a small `block_t`."""
    from gsoc_wav2vec2_tpu.ops.pallas.pos_conv import (
        pos_conv_blocked,
        pos_conv_fused,
    )

    t, g, k = 320, 16, 128  # 3 tiles at block_t=128
    x, params = _setup(t, c=64)
    kernel = weight_norm_kernel(params["weight_v"], params["weight_g"])
    xb = x.astype(jnp.bfloat16)
    whole = pos_conv_fused(
        xb, kernel, params["bias"],
        kernel_size=k, groups=g, gelu_approx=True, interpret=True,
    )
    blocked = pos_conv_blocked(
        xb, kernel, params["bias"],
        kernel_size=k, groups=g, gelu_approx=True, interpret=True,
        block_t=128,
    )
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(blocked))
    # no-bias leg too
    whole_nb = pos_conv_fused(
        xb, kernel, None,
        kernel_size=k, groups=g, gelu_approx=True, interpret=True,
    )
    blocked_nb = pos_conv_blocked(
        xb, kernel, None,
        kernel_size=k, groups=g, gelu_approx=True, interpret=True,
        block_t=128,
    )
    np.testing.assert_array_equal(np.asarray(whole_nb), np.asarray(blocked_nb))


@pytest.mark.slow
def test_pos_conv_blocked_train_grads_match_xla():
    """Gradients through the time-blocked driver (multi-tile, overlapping
    slice cotangents summing in XLA) vs jax.grad through the XLA conv."""
    from gsoc_wav2vec2_tpu.ops.pallas.pos_conv import pos_conv_blocked

    g, k, t, c = 16, 128, 320, 64
    x, params = _setup(t, c=c)
    probe = jax.random.normal(jax.random.PRNGKey(9), (2, t, c), jnp.float32)

    def loss_ref(params, x):
        y = pos_conv_embed(x, params, k, g, True)  # XLA path on CPU
        return jnp.sum(y * probe)

    def loss_blocked(params, x):
        kernel = weight_norm_kernel(params["weight_v"], params["weight_g"])
        y = pos_conv_blocked(
            x.astype(jnp.bfloat16), kernel, params["bias"],
            kernel_size=k, groups=g, gelu_approx=True, interpret=True,
            training=True, block_t=128,
        )
        return jnp.sum(y.astype(jnp.float32) * probe)

    want = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    got = jax.grad(loss_blocked, argnums=(0, 1))(params, x)

    flat_w, _ = jax.tree_util.tree_flatten_with_path(want)
    flat_g, _ = jax.tree_util.tree_flatten_with_path(got)
    for (path, w), (_, gg) in zip(flat_w, flat_g):
        w, gg = np.asarray(w, np.float32), np.asarray(gg, np.float32)
        assert w.shape == gg.shape, path
        scale = np.abs(w).mean() + 1e-6
        rel = np.abs(gg - w).mean() / scale
        assert rel < 0.05, f"{path}: mean rel err {rel:.4f}"
        assert np.abs(gg - w).max() / (np.abs(w).max() + 1e-6) < 0.2, path
