"""Multi-device (8 virtual CPU) tests for the sharded training stack.

The reference had NO distributed tests (SURVEY.md §4: validated by running
`main.py` on a real v3-8).  Here the data∥tensor-parallel train step runs on
a virtual 8-device mesh in CI, per the JAX-native test recipe.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config
from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
from gsoc_wav2vec2_tpu.parallel import (
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_specs,
    replicated,
    shard_params,
)
from gsoc_wav2vec2_tpu.training import (
    TrainState,
    create_optimizer,
    make_grad_accum_steps,
    make_train_step,
    stage2_lr_schedule,
    trainable_mask,
)


@pytest.fixture(scope="module")
def tiny_config():
    return Wav2Vec2Config(
        hidden_size=64,
        num_heads=4,
        num_layers=2,
        intermediate_size=128,
        filter_sizes=[32, 32],
        kernal_sizes=[10, 3],
        strides=[5, 2],
    )


def _make_batch(rng, global_batch, audio_len=4000, label_len=8):
    labels = np.zeros((global_batch, label_len), np.int32)
    labels[:, :3] = [5, 6, 7]
    return {
        "speech": jax.random.normal(rng, (global_batch, audio_len), jnp.float32),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((global_batch, audio_len), jnp.float32),
    }


def test_param_specs_tensor_parallel(tiny_config):
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), tiny_config)
    specs = param_specs(params)
    layers = specs["wav2vec2"]["encoder"]["layers"]
    # column-parallel: trailing dim sharded; stacked layer dim replicated
    assert layers["attention"]["q_proj"]["kernel"] == jax.sharding.PartitionSpec(
        None, None, MODEL_AXIS
    )
    assert layers["feed_forward"]["output_dense"]["kernel"] == (
        jax.sharding.PartitionSpec(None, MODEL_AXIS, None)
    )
    # conv front-end replicated
    conv = specs["wav2vec2"]["feature_extractor"]["conv_layers"][0]["conv"]["kernel"]
    assert conv == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
@pytest.mark.slow
def test_sharded_train_step_runs_and_learns(tiny_config, mesh_shape):
    data, model = mesh_shape
    mesh = make_mesh(data=data, model=model)
    params = shard_params(
        init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), tiny_config), mesh
    )
    tx = create_optimizer(1e-3)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)),
        params=params,
        opt_state=jax.jit(tx.init)(params),
    )
    global_batch = data * 2
    step = make_train_step(
        tiny_config,
        tx,
        division_factor=global_batch,
        with_attention_mask=True,
        compute_dtype=jnp.float32,
    )
    b_shard = batch_sharding(mesh)
    batch = jax.device_put(_make_batch(jax.random.PRNGKey(1), global_batch), b_shard)
    rng = jax.device_put(jax.random.PRNGKey(2), replicated(mesh))

    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3
    # same batch re-fed: Adam must reduce the loss
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_grad_accum_matches_big_batch(tiny_config):
    """Two accumulated microbatches of 8 must produce the same optimizer
    updates as one batch of 16: SUM/division_factor loss semantics make
    summed microbatch grads equal the big-batch grad (the mechanism that
    lets a single chip reproduce the reference's global-batch-256 recipe,
    `/root/reference/src/main.py:156`)."""
    import dataclasses

    import optax

    # deterministic variant: equality must not depend on dropout RNG streams.
    # SGD (not Adam) for the trajectory comparison: Adam amplifies float-level
    # noise on mathematically-zero gradients (k_proj bias — softmax is
    # invariant to a constant added across keys) into ±lr-sized sign flips.
    config = dataclasses.replace(tiny_config, dropout=0.0, apply_spec_augment=False)
    mesh = make_mesh(data=8, model=1)
    tx = optax.sgd(1e-3)

    def fresh_state():
        params = shard_params(
            init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config), mesh
        )
        return TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)),
            params=params,
            opt_state=jax.jit(tx.init)(params),
        )

    batch = _make_batch(jax.random.PRNGKey(1), 16)
    b_shard = batch_sharding(mesh)
    big = jax.device_put(batch, b_shard)
    micros = [
        jax.device_put({k: v[i * 8:(i + 1) * 8] for k, v in batch.items()}, b_shard)
        for i in range(2)
    ]
    rng = jax.device_put(jax.random.PRNGKey(2), replicated(mesh))
    kwargs = dict(division_factor=16, with_attention_mask=True,
                  compute_dtype=jnp.float32)

    state_big = fresh_state()
    step = make_train_step(config, tx, **kwargs)
    big_losses = []
    for _ in range(2):
        state_big, metrics = step(state_big, big, rng)
        big_losses.append(float(metrics["loss"]))

    init_fn, accum_fn, apply_fn = make_grad_accum_steps(config, tx, **kwargs)

    # gradient-level equality: one accumulation of the full batch IS the
    # big-batch gradient; two microbatch accumulations must reproduce it
    probe = fresh_state()
    step0 = probe.step
    g_big, l_big = init_fn(probe.params)
    g_big, l_big = accum_fn(probe.params, big, rng, step0, jnp.int32(0), g_big, l_big)
    g_acc, l_acc = init_fn(probe.params)
    for i, m in enumerate(micros):
        g_acc, l_acc = accum_fn(probe.params, m, rng, step0, jnp.int32(i), g_acc, l_acc)
    np.testing.assert_allclose(float(l_acc), float(l_big), rtol=1e-6)
    flat_gb = jax.tree_util.tree_leaves_with_path(g_big)
    flat_ga = dict(jax.tree_util.tree_leaves_with_path(g_acc))
    for path, leaf in flat_gb:
        # bound |diff| by the leaf's gradient scale, not per element: f32
        # reassociation (one sum of 16 vs two sums of 8, and reordered
        # near-cancelling conv accumulations) moves individual near-zero
        # elements by ~1e-4 while any structural accumulation bug (missing
        # microbatch, wrong division) would be O(leaf magnitude)
        a, b = np.asarray(leaf), np.asarray(flat_ga[path])
        bound = 1e-4 * max(1.0, float(np.abs(a).max()))
        assert np.abs(a - b).max() <= bound, (
            f"{path}: max diff {np.abs(a - b).max():.3e} > {bound:.3e}"
        )

    state_acc = fresh_state()
    acc_losses = []
    for _ in range(2):
        grads, loss = init_fn(state_acc.params)
        for i, m in enumerate(micros):
            grads, loss = accum_fn(
                state_acc.params, m, rng, state_acc.step, jnp.int32(i), grads, loss
            )
        state_acc, metrics = apply_fn(state_acc, grads, loss)
        acc_losses.append(float(metrics["loss"]))

    assert int(state_acc.step) == 2
    np.testing.assert_allclose(acc_losses, big_losses, rtol=1e-5)
    flat_big = jax.tree_util.tree_leaves_with_path(state_big.params)
    flat_acc = dict(jax.tree_util.tree_leaves_with_path(state_acc.params))
    assert flat_big
    for path, leaf in flat_big:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_acc[path]),
            rtol=2e-5, atol=2e-6, err_msg=str(path),
        )


@pytest.mark.slow
def test_frozen_subtree_stays_fixed(tiny_config):
    mesh = make_mesh(data=8, model=1)
    params0 = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), tiny_config)
    # snapshot before the step: state donation may recycle aliased buffers
    before = np.asarray(params0["wav2vec2"]["feature_projection"]["projection"]["kernel"])
    head_before = np.asarray(params0["lm_head"]["kernel"])
    params = shard_params(params0, mesh)
    # stage-1 recipe: whole backbone frozen, only lm_head trains
    # (reference `main.py:210`)
    mask = trainable_mask(params, ("wav2vec2",))
    tx = create_optimizer(1e-3, mask)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)),
        params=params,
        opt_state=jax.jit(tx.init)(params),
    )
    step = make_train_step(
        tiny_config, tx, division_factor=16, with_attention_mask=True,
        compute_dtype=jnp.float32,
    )
    batch = jax.device_put(
        _make_batch(jax.random.PRNGKey(1), 16), batch_sharding(mesh)
    )
    state, _ = step(state, batch, jax.device_put(jax.random.PRNGKey(2), replicated(mesh)))

    after = np.asarray(state.params["wav2vec2"]["feature_projection"]["projection"]["kernel"])
    np.testing.assert_array_equal(before, after)
    head_after = np.asarray(state.params["lm_head"]["kernel"])
    assert np.abs(head_after - head_before).max() > 0


def test_stage2_lr_schedule():
    # reference `training_utils.py:24-31`: lr1 until the transition epoch,
    # lr2 after
    sched = stage2_lr_schedule(1e-4, 5e-5, transition_step=100)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(99)) == pytest.approx(1e-4)
    assert float(sched(100)) == pytest.approx(5e-5)
    assert float(sched(1000)) == pytest.approx(5e-5)


@pytest.mark.slow
def test_train_step_flash_attention_matches_xla_under_tp(tiny_config):
    """Flash attention (shard_map-partitioned Pallas kernel, interpret mode)
    composes with the full tensor-parallel train step: the loss trajectory
    must match the XLA-attention step on a 4x2 mesh (VERDICT r1 #3)."""
    from gsoc_wav2vec2_tpu.ops.pallas import flash_attention as fa_mod

    mesh = make_mesh(data=4, model=2)
    global_batch = 8

    def run(attention_impl):
        params = shard_params(
            init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), tiny_config), mesh
        )
        tx = create_optimizer(1e-3)
        state = TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)),
            params=params,
            opt_state=jax.jit(tx.init)(params),
        )
        step = make_train_step(
            tiny_config,
            tx,
            division_factor=global_batch,
            with_attention_mask=True,
            compute_dtype=jnp.float32,
            mesh=mesh,
            attention_impl=attention_impl,
        )
        batch = jax.device_put(
            _make_batch(jax.random.PRNGKey(1), global_batch), batch_sharding(mesh)
        )
        rng = jax.device_put(jax.random.PRNGKey(2), replicated(mesh))
        losses = []
        for _ in range(2):
            state, metrics = step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        return losses

    orig = fa_mod.flash_attention
    try:
        fa_mod.flash_attention = lambda *a, **kw: orig(
            *a, **{**kw, "interpret": True}
        )
        flash_losses = run("flash")
    finally:
        fa_mod.flash_attention = orig
    xla_losses = run("xla")
    # both paths share the same rng stream; attention-prob dropout (0.1)
    # differs between the in-kernel mask and the XLA mask, so compare loosely
    np.testing.assert_allclose(flash_losses, xla_losses, rtol=0.05)


@pytest.mark.slow
def test_robust_family_train_step():
    """The robust/large geometry (pre-norm, LayerNorm conv stack, conv
    biases, attention masks) through the full sharded train step — the
    XLSR-53 training path."""
    from gsoc_wav2vec2_tpu.models.config import RobustWav2Vec2Config

    config = RobustWav2Vec2Config(
        hidden_size=64,
        num_heads=4,
        num_layers=2,
        intermediate_size=128,
        filter_sizes=[32, 32],
        kernal_sizes=[10, 3],
        strides=[5, 2],
    )
    assert config.attention_norm_type == "prenorm"
    assert config.conv_bias
    mesh = make_mesh(data=4, model=2)
    params = shard_params(
        init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config), mesh
    )
    tx = create_optimizer(1e-3)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)),
        params=params,
        opt_state=jax.jit(tx.init)(params),
    )
    global_batch = 8
    step = make_train_step(
        config, tx, division_factor=global_batch,
        with_attention_mask=True, compute_dtype=jnp.float32, mesh=mesh,
        frozen=("feature_extractor",),
    )
    batch = _make_batch(jax.random.PRNGKey(1), global_batch)
    # ragged mask: half the batch is shorter
    mask = np.array(batch["attention_mask"])  # writable copy
    mask[::2, 3000:] = 0.0
    batch["attention_mask"] = jnp.asarray(mask)
    rng = jax.device_put(jax.random.PRNGKey(2), replicated(mesh))
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
