"""Pallas flash-attention kernel parity vs the XLA einsum path — forward,
custom-VJP backward, and in-kernel dropout.

Runs in interpreter mode on CPU (compiled-mode parity on a real TPU is
exercised by bench/verification runs; the interpreter executes the same
kernel program, including the TPU PRNG ops).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu.ops.attention import mask_to_bias, mha, mha_xla
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
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_flash_matches_reference_masked():
    q, k, v = _qkv(jax.random.PRNGKey(1), b=2, l=256)
    mask = np.ones((2, 256), np.float32)
    mask[0, 100:] = 0.0  # ragged batch
    mask[1, 200:] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))
    got = flash_attention(q, k, v, bias, interpret=True)
    want = _reference(q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(got)[0, :, :100], np.asarray(want)[0, :, :100], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got)[1, :, :200], np.asarray(want)[1, :, :200], atol=1e-4
    )


def test_flash_q_blocking_equivalent():
    q, k, v = _qkv(jax.random.PRNGKey(2), l=512)
    full = flash_attention(q, k, v, q_block=512, interpret=True)
    blocked = flash_attention(q, k, v, q_block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(blocked), atol=1e-4)


def test_flash_bf16():
    q, k, v = _qkv(jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    got = flash_attention(q, k, v, interpret=True).astype(jnp.float32)
    want = _reference(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


# --- backward (custom VJP) ---------------------------------------------------


def test_flash_grad_matches_reference_grad():
    q, k, v = _qkv(jax.random.PRNGKey(4), b=1, h=2, l=256)
    mask = np.ones((1, 256), np.float32)
    mask[0, 180:] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))
    w = jax.random.normal(jax.random.PRNGKey(5), q.shape, jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, interpret=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, bias) * w)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, t, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(t), atol=1e-3, err_msg=f"d{name}"  # TPU f32 dot: bf16x3
        )


def test_flash_dropout_statistics_and_determinism():
    q, k, v = _qkv(jax.random.PRNGKey(6), b=1, h=2, l=128)
    f = functools.partial(flash_attention, interpret=True)
    clean = np.asarray(f(q, k, v))
    d1 = np.asarray(f(q, k, v, dropout_rate=0.5, dropout_seed=7))
    d2 = np.asarray(f(q, k, v, dropout_rate=0.5, dropout_seed=7))
    d3 = np.asarray(f(q, k, v, dropout_rate=0.5, dropout_seed=8))
    np.testing.assert_array_equal(d1, d2)  # same seed -> identical
    assert np.abs(d1 - d3).max() > 1e-4  # different seed -> different
    assert np.abs(d1 - clean).max() > 1e-4  # dropout does something
    # unbiasedness: E[dropped probs]/keep == probs, so outputs agree on avg
    outs = [
        np.asarray(f(q, k, v, dropout_rate=0.5, dropout_seed=s))
        for s in range(24)
    ]
    np.testing.assert_allclose(np.mean(outs, axis=0), clean, atol=0.12)


@pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="TPU f32 dots (bf16x3) add ~1e-3 rel noise per loss eval, which "
    "the FD quotient amplifies past the tolerance; the CPU run checks the "
    "math exactly and test_flash_dropout_compiled_matches_interpret checks "
    "the compiled kernel bit-for-bit",
)
def test_flash_dropout_grad_finite_differences():
    """With a FIXED seed the kernel is a deterministic function, so the
    custom VJP (which regenerates the mask in backward) must match central
    finite differences — this catches any fwd/bwd mask misalignment.

    (This DID catch one: `pltpu.prng_random_bits`'s bit-to-element mapping
    follows the per-kernel vector layout, so hardware-PRNG masks diverged
    between forward and backward — hence the counter-based hash.)"""
    q, k, v = _qkv(jax.random.PRNGKey(8), b=1, h=1, l=128)
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(
                q, k, v, dropout_rate=0.3, dropout_seed=11, interpret=True
            )
            * w
        )

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rng = np.random.default_rng(0)
    for arg_idx, (arg, g) in enumerate(zip((q, k, v), grads)):
        direction = jnp.asarray(
            rng.standard_normal(arg.shape).astype(np.float32)
        )
        eps = 1e-2
        args_p = [q, k, v]
        args_m = [q, k, v]
        args_p[arg_idx] = arg + eps * direction
        args_m[arg_idx] = arg - eps * direction
        fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
        analytic = float(jnp.sum(g * direction))
        assert fd == pytest.approx(analytic, rel=2e-2, abs=2e-2), f"arg {arg_idx}"


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs the compiled TPU kernel"
)
def test_flash_dropout_compiled_matches_interpret():
    """The compiled kernel must produce the same dropout mask as the
    interpreter (layout independence of the counter-based hash)."""
    q, k, v = _qkv(jax.random.PRNGKey(10), b=1, h=1, l=128)
    a = np.asarray(flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=11))
    b = np.asarray(
        flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=11,
                        interpret=True)
    )
    np.testing.assert_array_equal(a, b)


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
    from gsoc_wav2vec2_tpu.ops.pallas import flash_attention as fa_mod

    orig = fa_mod.flash_attention
    try:
        fa_mod.flash_attention = functools.partial(orig, interpret=True)
        got = mha(x, params, heads, impl="flash")
    finally:
        fa_mod.flash_attention = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_supports_gate():
    assert supports(768, 64, training=False)
    assert supports(768, 64, training=True)
    assert supports(1249, 64, training=False)      # padded internally
    assert supports(1249, 64, training=True)       # the 400k-sample recipe shape
    assert supports(4096, 64, training=True)       # whole-K/V fast path cap
    assert supports(8192, 64, training=True)       # kv-blocked path (round 4)
    assert supports(32768, 64, training=True)      # the lifted cap
    assert not supports(32769, 64, training=False)  # lse/residuals stop scaling


def test_flash_odd_length_padding():
    """Lengths that are not lane multiples (e.g. 400000 samples -> 1249
    frames) run through internal -inf-bias padding; outputs and gradients
    must match the unpadded einsum reference on the real rows."""
    l = 200  # not a multiple of 128
    q, k, v = _qkv(jax.random.PRNGKey(11), b=1, h=2, l=l)
    got = flash_attention(q, k, v, interpret=True)
    want = _reference(q, k, v)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    w = jax.random.normal(jax.random.PRNGKey(12), q.shape, jnp.float32)
    g = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v, interpret=True) * w))(q)
    g_ref = jax.grad(lambda q: jnp.sum(_reference(q, k, v) * w))(q)
    # 1e-3: TPU f32 dots are bf16x3 (~1e-3 rel noise); exact on CPU
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3)


# --- shard_map composition (tensor/data parallel meshes) ----------------------


needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device (virtual CPU) mesh"
)

def _mesh_4x2():
    from gsoc_wav2vec2_tpu.parallel.mesh import make_mesh

    return make_mesh(data=4, model=2)


@needs_mesh
def test_shard_mapped_flash_matches_reference_4x2_mesh():
    """Partitioned kernel instances (batch over data, heads over model) must
    reproduce the single-device math — the GSPMD-opacity fix (VERDICT r1 #3)."""
    from gsoc_wav2vec2_tpu.ops.pallas.flash_attention import (
        shard_mapped_flash_attention,
    )

    mesh = _mesh_4x2()
    q, k, v = _qkv(jax.random.PRNGKey(13), b=8, h=4, l=256)
    mask = np.ones((8, 256), np.float32)
    mask[:, 170:] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))

    got = shard_mapped_flash_attention(
        q, k, v, bias, mesh=mesh, data_axis="data", model_axis="model",
        interpret=True,
    )
    want = _reference(q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(got)[:, :, :170], np.asarray(want)[:, :, :170], atol=1e-4
    )


@needs_mesh
def test_shard_mapped_flash_grad_matches_reference():
    """custom-VJP × shard_map: gradients must flow per-shard correctly."""
    from gsoc_wav2vec2_tpu.ops.pallas.flash_attention import (
        shard_mapped_flash_attention,
    )

    mesh = _mesh_4x2()
    q, k, v = _qkv(jax.random.PRNGKey(14), b=4, h=2, l=128)
    w = jax.random.normal(jax.random.PRNGKey(15), q.shape, jnp.float32)

    def loss_sharded(q, k, v):
        out = shard_mapped_flash_attention(
            q, k, v, None, mesh=mesh, data_axis="data", model_axis="model",
            interpret=True,
        )
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v) * w)

    got = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, t, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(t), atol=1e-3, err_msg=f"d{name}"
        )


@needs_mesh
def test_mha_flash_with_mesh_matches_xla():
    """`mha(impl='flash', mesh=...)` — the full projection block through the
    shard_map wrapper under a 4x2 mesh equals the XLA einsum path."""
    rng = jax.random.PRNGKey(16)
    h_dim, heads, l = 128, 2, 256
    keys = jax.random.split(rng, 9)
    params = {
        name: {
            "kernel": jax.random.normal(keys[i], (h_dim, h_dim), jnp.float32) * 0.05,
            "bias": jax.random.normal(keys[i + 4], (h_dim,), jnp.float32) * 0.01,
        }
        for i, name in enumerate(["q_proj", "k_proj", "v_proj", "out_proj"])
    }
    x = jax.random.normal(keys[8], (4, l, h_dim), jnp.float32)
    mesh = _mesh_4x2()

    want = mha_xla(x, params, heads)
    from gsoc_wav2vec2_tpu.ops.pallas import flash_attention as fa_mod

    orig = fa_mod.flash_attention
    try:
        # force interpret even where the wrapper passes interpret= explicitly
        fa_mod.flash_attention = lambda *a, **kw: orig(
            *a, **{**kw, "interpret": True}
        )
        got = mha(x, params, heads, impl="flash", mesh=mesh)
    finally:
        fa_mod.flash_attention = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@needs_mesh
def test_shard_mapped_dropout_decorrelated_and_deterministic():
    """Each shard folds its mesh index into the dropout seed: the sharded
    result is reproducible but NOT the single-device mask pattern (which
    would correlate dropout across batch/head shards)."""
    from gsoc_wav2vec2_tpu.ops.pallas.flash_attention import (
        flash_attention as fa,
        shard_mapped_flash_attention,
    )

    mesh = _mesh_4x2()
    q, k, v = _qkv(jax.random.PRNGKey(17), b=4, h=2, l=128)
    kwargs = dict(dropout_rate=0.5, dropout_seed=5, interpret=True)

    a = np.asarray(shard_mapped_flash_attention(
        q, k, v, None, mesh=mesh, data_axis="data", model_axis="model", **kwargs
    ))
    b = np.asarray(shard_mapped_flash_attention(
        q, k, v, None, mesh=mesh, data_axis="data", model_axis="model", **kwargs
    ))
    np.testing.assert_array_equal(a, b)  # deterministic given the seed
    single = np.asarray(fa(q, k, v, **kwargs))
    # shard (0, 0) uses the unmodified seed -> matches the single-device mask
    np.testing.assert_allclose(a[0, 0], single[0, 0], atol=1e-5)
    # other shards fold in their mesh index -> different masks
    assert np.abs(a[1:] - single[1:]).max() > 1e-3


@pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="finite differences / 1e-5 tolerances need exact CPU f32 math "
    "(TPU f32 dots are bf16x3)",
)
def test_flash_long_sequence_grad_with_dropout():
    """The q-blocked backward + global-index dropout mask at the training
    recipe shape (400 000 samples -> 1249 frames, not a lane multiple, past
    the old 1024-frame cap): fwd and bwd block the q axis differently, so
    any fwd/bwd mask misalignment shows up as a wrong gradient vs central
    finite differences."""
    l = 1249
    q, k, v = _qkv(jax.random.PRNGKey(20), b=1, h=1, l=l)
    w = jax.random.normal(jax.random.PRNGKey(21), q.shape, jnp.float32)

    def loss(q):
        return jnp.sum(
            flash_attention(
                q, k, v, dropout_rate=0.2, dropout_seed=9,
                q_block=256, interpret=True,
            )
            * w
        )

    g = jax.grad(loss)(q)
    rng = np.random.default_rng(1)
    direction = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    eps = 1e-2
    fd = (float(loss(q + eps * direction)) - float(loss(q - eps * direction))) / (2 * eps)
    analytic = float(jnp.sum(g * direction))
    assert fd == pytest.approx(analytic, rel=2e-2, abs=2e-2)


@pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="finite differences / 1e-5 tolerances need exact CPU f32 math "
    "(TPU f32 dots are bf16x3)",
)
def test_flash_bwd_blocking_invariant():
    """dk/dv accumulate across q blocks: gradients must not depend on the
    block size."""
    l = 512
    q, k, v = _qkv(jax.random.PRNGKey(22), b=1, h=2, l=l)
    w = jax.random.normal(jax.random.PRNGKey(23), q.shape, jnp.float32)

    def grads(q_block):
        def loss(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, q_block=q_block, interpret=True) * w
            )
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    for a, b, name in zip(grads(512), grads(128), "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=f"d{name}"
        )


# --- kv-blocked long-sequence kernels (L > WHOLE_KV_LIMIT) --------------------

import gsoc_wav2vec2_tpu.ops.pallas.flash_attention as fa_mod


@pytest.fixture()
def small_blocked(monkeypatch):
    """Engage the kv-blocked dispatch at test-size lengths (the real
    threshold is 4096 frames — too big for CPU interpret iteration)."""
    monkeypatch.setattr(fa_mod, "WHOLE_KV_LIMIT", 128)
    monkeypatch.setattr(fa_mod, "BLOCKED_Q", 64)
    monkeypatch.setattr(fa_mod, "BLOCKED_KV", 128)


needs_cpu_f32 = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="finite differences / 1e-4 tolerances need exact CPU f32 math "
    "(TPU f32 dots are bf16x3); "
    "test_blocked_compiled_matches_whole_k_compiled covers the compiled "
    "TPU kernels",
)


@needs_cpu_f32
def test_blocked_fwd_matches_reference_masked(small_blocked):
    q, k, v = _qkv(jax.random.PRNGKey(30), b=2, h=2, l=384)
    mask = np.ones((2, 384), np.float32)
    mask[0, 300:] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))
    got = flash_attention(q, k, v, bias, interpret=True)
    want = _reference(q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(got)[0, :, :300], np.asarray(want)[0, :, :300], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got)[1], np.asarray(want)[1], atol=1e-4
    )


@needs_cpu_f32
def test_blocked_grad_matches_reference(small_blocked):
    q, k, v = _qkv(jax.random.PRNGKey(31), b=1, h=2, l=384)
    mask = np.ones((1, 384), np.float32)
    mask[0, 290:] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))
    w = jax.random.normal(jax.random.PRNGKey(32), q.shape, jnp.float32)
    valid = jnp.asarray(mask)[:, None, :, None]

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, interpret=True) * w * valid)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, bias) * w * valid)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, err_msg=f"d{name}"
        )


@needs_cpu_f32
def test_blocked_dropout_grad_finite_differences(small_blocked):
    """The three blocked kernels regenerate the dropout mask independently
    (fwd online-softmax, dq pass, dk/dv pass) — any misalignment of the
    global-index hash across the THREE different tilings shows up against
    central finite differences."""
    q, k, v = _qkv(jax.random.PRNGKey(33), b=1, h=1, l=256)
    w = jax.random.normal(jax.random.PRNGKey(34), q.shape, jnp.float32)

    def loss(q):
        return jnp.sum(
            flash_attention(
                q, k, v, dropout_rate=0.3, dropout_seed=17, interpret=True
            ) * w
        )

    g = jax.grad(loss)(q)
    rng = np.random.default_rng(2)
    direction = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    eps = 1e-3
    fd = (float(loss(q + eps * direction)) - float(loss(q - eps * direction))) / (
        2 * eps
    )
    analytic = float(jnp.sum(g * direction))
    assert fd == pytest.approx(analytic, rel=5e-3, abs=1e-2)


@needs_cpu_f32
def test_blocked_path_matches_whole_k_path_with_dropout(monkeypatch):
    """Both kernel families hash dropout from GLOBAL (row, col) element
    indices, and masking commutes with normalisation — at the same (L,
    seed) the two paths must agree to float tolerance, outputs AND
    gradients."""
    l = 256
    q, k, v = _qkv(jax.random.PRNGKey(35), b=1, h=2, l=l)
    w = jax.random.normal(jax.random.PRNGKey(36), q.shape, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(
                q, k, v, dropout_rate=0.25, dropout_seed=7, interpret=True
            ) * w
        )

    whole_out = flash_attention(
        q, k, v, dropout_rate=0.25, dropout_seed=7, interpret=True
    )
    whole_g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.setattr(fa_mod, "WHOLE_KV_LIMIT", 128)
    monkeypatch.setattr(fa_mod, "BLOCKED_Q", 64)
    monkeypatch.setattr(fa_mod, "BLOCKED_KV", 128)
    blocked_out = flash_attention(
        q, k, v, dropout_rate=0.25, dropout_seed=7, interpret=True
    )
    blocked_g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    np.testing.assert_allclose(
        np.asarray(whole_out), np.asarray(blocked_out), atol=1e-5
    )
    for name, a, b in zip("qkv", whole_g, blocked_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{name}"
        )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs the compiled TPU kernels"
)
def test_blocked_compiled_matches_whole_k_compiled(monkeypatch):
    """Compiled-mode parity on the real chip: the kv-blocked family must
    reproduce the whole-K family's outputs AND gradients at the same
    (L, seed) — both run at identical TPU dot precision, so agreement is
    tight even where CPU-vs-TPU comparisons are not.  This is the hardware
    analog of `test_blocked_path_matches_whole_k_path_with_dropout` (which
    needs exact CPU f32 math)."""
    l = 512
    q, k, v = _qkv(jax.random.PRNGKey(50), b=1, h=2, l=l)
    mask = np.ones((1, l), np.float32)
    mask[0, 400:] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))
    w = jax.random.normal(jax.random.PRNGKey(51), q.shape, jnp.float32)
    valid = jnp.asarray(mask)[:, None, :, None]

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, bias, dropout_rate=0.25, dropout_seed=9)
            * w * valid
        )

    whole_out = flash_attention(
        q, k, v, bias, dropout_rate=0.25, dropout_seed=9
    )
    whole_g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.setattr(fa_mod, "WHOLE_KV_LIMIT", 128)
    monkeypatch.setattr(fa_mod, "BLOCKED_Q", 128)
    monkeypatch.setattr(fa_mod, "BLOCKED_KV", 256)
    blocked_out = flash_attention(
        q, k, v, bias, dropout_rate=0.25, dropout_seed=9
    )
    blocked_g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    np.testing.assert_allclose(
        np.asarray(whole_out * valid), np.asarray(blocked_out * valid),
        atol=2e-3,
    )
    for name, a, b in zip("qkv", whole_g, blocked_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, err_msg=f"d{name}"
        )


@pytest.mark.slow
def test_blocked_real_dispatch_past_old_cap():
    """L=4608 (> WHOLE_KV_LIMIT) through the REAL dispatch thresholds: the
    old 4096 cap is genuinely lifted, not just at toy block sizes."""
    q, k, v = _qkv(jax.random.PRNGKey(37), b=1, h=1, l=4608)
    got = flash_attention(q, k, v, interpret=True)
    want = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.slow
def test_train_step_8192_frames():
    """A full optimizer step at 8192 encoder frames (~82 s of audio for the
    tiny conv stack) — the shape where the whole-K design refused to train
    and the XLA fallback needs a 76 GB dropout mask.  Forces the flash
    path (interpret on CPU, compiled on a real TPU) and checks the loss is
    finite and the step completes."""
    import functools as ft

    from gsoc_wav2vec2_tpu import Wav2Vec2Config
    from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
    from gsoc_wav2vec2_tpu.training import (
        TrainState, create_optimizer, make_train_step,
    )

    config = Wav2Vec2Config(
        hidden_size=64, num_heads=1, num_layers=1, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    audio_len = 81930  # -> exactly 8192 frames through the [5,2] stack
    assert int(config.conv_output_length(audio_len)) == 8192
    assert supports(8192, 64, training=True)

    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    tx = create_optimizer(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=jax.jit(tx.init)(params),
    )
    step = make_train_step(
        config, tx, division_factor=1, with_attention_mask=False,
        compute_dtype=jnp.float32, remat=True, attention_impl="flash",
    )
    batch = {
        "speech": jax.random.normal(
            jax.random.PRNGKey(1), (1, audio_len), jnp.float32
        ),
        "labels": jnp.asarray([[5, 6, 7, 8]], jnp.int32),
    }

    orig = fa_mod.flash_attention
    calls = []

    def spy(*args, **kwargs):
        calls.append(args[0].shape)
        if jax.default_backend() != "tpu":
            kwargs["interpret"] = True
        return orig(*args, **kwargs)

    fa_mod.flash_attention = spy
    try:
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        loss = float(metrics["loss"])
    finally:
        fa_mod.flash_attention = orig
    assert np.isfinite(loss), loss
    assert int(state.step) == 1
    assert calls and all(s[2] == 8192 for s in calls), calls


@needs_mesh
def test_shard_mapped_blocked_kernels_match_reference(monkeypatch):
    """The kv-blocked kernel family composes with the shard_map wrapper the
    same way the whole-K family does: per-shard instances over a 4x2 mesh,
    forward AND gradients equal to the single-device einsum reference."""
    from gsoc_wav2vec2_tpu.ops.pallas.flash_attention import (
        shard_mapped_flash_attention,
    )

    monkeypatch.setattr(fa_mod, "WHOLE_KV_LIMIT", 64)
    monkeypatch.setattr(fa_mod, "BLOCKED_Q", 64)
    monkeypatch.setattr(fa_mod, "BLOCKED_KV", 128)
    mesh = _mesh_4x2()
    q, k, v = _qkv(jax.random.PRNGKey(40), b=4, h=2, l=256)
    mask = np.ones((4, 256), np.float32)
    mask[:, 200:] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))
    w = jax.random.normal(jax.random.PRNGKey(41), q.shape, jnp.float32)
    valid = jnp.asarray(mask)[:, None, :, None]

    def loss_sharded(q, k, v):
        out = shard_mapped_flash_attention(
            q, k, v, bias, mesh=mesh, data_axis="data", model_axis="model",
            interpret=True,
        )
        return jnp.sum(out * w * valid)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, bias) * w * valid)

    got_out = shard_mapped_flash_attention(
        q, k, v, bias, mesh=mesh, data_axis="data", model_axis="model",
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_out)[:, :, :200],
        np.asarray(_reference(q, k, v, bias))[:, :, :200],
        atol=1e-4,
    )
    got = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, t, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(t), atol=1e-3, err_msg=f"d{name}"
        )
