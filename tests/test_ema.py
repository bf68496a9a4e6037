"""EMA shadow weights (`make_train_step(ema_decay=...)`, `cli.train
--ema_decay`): online Polyak averaging maintained inside the jitted step —
the online counterpart of `cli.average`'s offline tail averaging.  The
reference has neither (its per-epoch H5 files are raw weights,
`/root/reference/src/training_utils.py:38-45`)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config
from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
from gsoc_wav2vec2_tpu.training import (
    TrainState,
    create_optimizer,
    make_grad_accum_steps,
    make_train_step,
)

TINY = dict(
    hidden_size=32, num_heads=2, num_layers=2, intermediate_size=64,
    filter_sizes=[16, 16], kernal_sizes=[10, 3], strides=[5, 2],
    dropout=0.0, survival_prob=1.0,
)
DECAY = 0.5


def _batch(b=2, rng=0):
    g = np.random.default_rng(rng)
    return {
        "speech": jnp.asarray(g.standard_normal((b, 4000)), jnp.float32),
        "labels": jnp.tile(jnp.array([[5, 6, 7, 0]], jnp.int32), (b, 1)),
    }


def _state(config, tx, ema=True):
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def test_ema_tracks_manual_shadow():
    """state.ema_params after k steps == host-computed
    d*shadow + (1-d)*params_k recursion from the captured trajectory."""
    config = Wav2Vec2Config(**TINY)
    tx = create_optimizer(1e-3)
    step = make_train_step(
        config, tx, division_factor=2.0, compute_dtype=jnp.float32,
        remat=False, ema_decay=DECAY,
    )
    state = _state(config, tx)
    shadow = jax.tree.map(np.asarray, state.params)
    rng = jax.random.PRNGKey(1)
    for k in range(3):
        state, metrics = step(state, _batch(rng=k), rng)
        params_k = jax.tree.map(np.asarray, state.params)
        shadow = jax.tree.map(
            lambda e, p: (DECAY * e + (1 - DECAY) * p).astype(e.dtype),
            shadow, params_k,
        )
    assert int(state.step) == 3
    for got, want in zip(
        jax.tree.leaves(state.ema_params), jax.tree.leaves(shadow)
    ):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-6, atol=1e-7)
    # EMA actually lags the raw params (it is a distinct trajectory)
    diffs = [
        float(np.abs(np.asarray(e) - np.asarray(p)).max())
        for e, p in zip(
            jax.tree.leaves(state.ema_params), jax.tree.leaves(state.params)
        )
    ]
    assert max(diffs) > 0


def test_ema_disabled_passes_none_through():
    config = Wav2Vec2Config(**TINY)
    tx = create_optimizer(1e-3)
    step = make_train_step(
        config, tx, division_factor=2.0, compute_dtype=jnp.float32,
        remat=False,
    )
    state = _state(config, tx, ema=False)
    state, _ = step(state, _batch(), jax.random.PRNGKey(1))
    assert state.ema_params is None


def test_grad_accum_apply_updates_ema():
    config = Wav2Vec2Config(**TINY)
    tx = create_optimizer(1e-3)
    init_fn, accum_fn, apply_fn = make_grad_accum_steps(
        config, tx, division_factor=4.0, compute_dtype=jnp.float32,
        remat=False, ema_decay=DECAY,
    )
    state = _state(config, tx)
    ema0 = jax.tree.map(np.asarray, state.ema_params)
    rng = jax.random.PRNGKey(2)
    grads, loss = init_fn(state.params)
    for i in range(2):
        grads, loss = accum_fn(
            state.params, _batch(rng=10 + i), rng, state.step,
            jnp.int32(i), grads, loss,
        )
    state, metrics = apply_fn(state, grads, loss)
    for e, e0, p in zip(
        jax.tree.leaves(state.ema_params),
        jax.tree.leaves(ema0),
        jax.tree.leaves(state.params),
    ):
        want = DECAY * e0 + (1 - DECAY) * np.asarray(p)
        np.testing.assert_allclose(np.asarray(e), want, rtol=2e-6, atol=1e-7)


def test_checkpoint_roundtrip_with_ema(tmp_path):
    """Orbax save/restore carries ema_params; pre-EMA states (None) keep
    their structure and still round-trip."""
    from gsoc_wav2vec2_tpu.training.checkpoint import CheckpointManager

    config = Wav2Vec2Config(**TINY)
    tx = create_optimizer(1e-3)
    state = _state(config, tx)
    state = state.replace(
        ema_params=jax.tree.map(lambda x: x * 2.0, state.ema_params)
    )
    mgr = CheckpointManager(str(tmp_path / "ema_ckpt"))
    mgr.save(1, state, wait=True)
    back = mgr.restore(state)
    mgr.close()
    for a, b in zip(
        jax.tree.leaves(back.ema_params), jax.tree.leaves(state.ema_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    plain = _state(config, tx, ema=False)
    mgr = CheckpointManager(str(tmp_path / "plain_ckpt"))
    mgr.save(1, plain, wait=True)
    back = mgr.restore(plain)
    mgr.close()
    assert back.ema_params is None


@pytest.mark.slow
def test_train_cli_ema_end_to_end(tmp_path):
    """--ema_decay through the full two-stage driver: writes final_ema/,
    which loads and differs from final/."""
    from flac_encoder import encode_flac
    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC

    rng = np.random.default_rng(11)
    chap = tmp_path / "corpus" / "1" / "1"
    chap.mkdir(parents=True)
    lines = []
    for i, text in enumerate(["HELLO WORLD", "TINY MODEL"]):
        sig = np.clip(
            2000 * np.sin(np.arange(6000) / 6.0)
            + rng.integers(-50, 50, 6000),
            -32768, 32767,
        ).astype(np.int64)
        (chap / f"1-1-{i:04d}.flac").write_bytes(
            encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7)
        )
        lines.append(f"1-1-{i:04d} {text}")
    (chap / "1-1.trans.txt").write_text("\n".join(lines))

    model_dir = str(tmp_path / "tiny_model")
    Wav2Vec2ForCTC(
        Wav2Vec2Config(
            hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
            filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
        ),
        seed=0,
    ).save_pretrained(model_dir)

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    ckpt_dir = str(tmp_path / "ckpts")
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.train",
            "--model_id", model_dir,
            "--train_dir", str(tmp_path / "corpus"),
            "--stage1_epochs", "1", "--stage2_epochs", "1",
            "--batch_size_per_device", "1",
            "--model_axis", "4",  # global batch 2 fits the 2-sample corpus
            "--audio_maxlen", "6000", "--labels_maxlen", "32",
            "--compute_dtype", "float32",
            "--ema_decay", "0.5",
            "--ckpt_dir", ckpt_dir,
            "--log_dir", str(tmp_path / "logs"),
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    run_dir = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
    assert "final_ema" in os.listdir(run_dir)

    final = Wav2Vec2ForCTC.from_pretrained(os.path.join(run_dir, "final"))
    ema = Wav2Vec2ForCTC.from_pretrained(os.path.join(run_dir, "final_ema"))
    speech = np.zeros((1, 4000), np.float32)
    for m in (final, ema):
        assert np.all(np.isfinite(np.asarray(m(speech))))
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(final.params), jax.tree.leaves(ema.params))
    ]
    assert max(diffs) > 0, "EMA weights should differ from raw weights"


@pytest.mark.slow
def test_pretrain_step_updates_ema():
    """make_pretrain_step(ema_decay=...): the shadow follows the same
    d*e + (1-d)*params recursion as the CTC trainer's."""
    import optax

    from tests.utils import tiny_pretraining_config

    from gsoc_wav2vec2_tpu.models.pretraining import (
        init_wav2vec2_for_pretraining_params,
        make_pretrain_step,
    )
    from gsoc_wav2vec2_tpu.ops.specaugment import compute_mask_indices

    config = tiny_pretraining_config()
    params = init_wav2vec2_for_pretraining_params(jax.random.PRNGKey(0), config)
    tx = optax.adamw(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )
    step = make_pretrain_step(
        config, tx, division_factor=2.0, compute_dtype=jnp.float32,
        remat=False, ema_decay=DECAY,
    )
    frames = int(config.conv_output_length(2000))
    rng = jax.random.PRNGKey(3)
    batch = {
        "speech": jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 2000)), jnp.float32
        ),
        "mask_time_indices": compute_mask_indices(rng, 2, frames, 0.5, 2),
    }
    shadow = jax.tree.map(np.asarray, state.params)
    for k in range(2):
        state, metrics = step(state, dict(batch), rng, jnp.float32(2.0))
        shadow = jax.tree.map(
            lambda e, p: (DECAY * e + (1 - DECAY) * np.asarray(p)).astype(e.dtype),
            shadow, state.params,
        )
    assert np.isfinite(float(metrics["loss"]))
    for got, want in zip(
        jax.tree.leaves(state.ema_params), jax.tree.leaves(shadow)
    ):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-6, atol=1e-7)
