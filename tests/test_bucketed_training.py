"""Bucketed training (round-3): 2-4 compiled shapes instead of one
truncate-to-`audio_maxlen` shape — the capability upgrade SURVEY §5 calls
out over the reference's `data_utils.py:75-78`.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config
from gsoc_wav2vec2_tpu.data.loaders import CommonDataLoader
from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
from gsoc_wav2vec2_tpu.training import TrainState, create_optimizer, make_train_step

TINY = dict(
    hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
    filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
)


def _loader(**kwargs):
    defaults = dict(
        batch_size=2, buffer_size=8, audio_pad_id=0, labels_pad_id=0,
        audio_maxlen=1000, labels_maxlen=8,
    )
    defaults.update(kwargs)
    return CommonDataLoader(**defaults)


def _samples(lengths):
    rng = np.random.default_rng(0)
    return [
        (rng.standard_normal(n).astype(np.float32),
         np.asarray([1, 2, 3], np.int32))
        for n in lengths
    ]


def test_bucketed_batches_pad_to_bucket_and_do_not_truncate():
    """Samples land in the smallest fitting bucket; a sample LONGER than
    audio_maxlen keeps its full length when a larger bucket exists (the
    whole point: the reference would have cut it at audio_maxlen)."""
    loader = _loader(bucket_boundaries=[500, 2000])
    samples = _samples([300, 450, 1800, 1500])
    batches = list(loader.batchify(iter(samples), seed=None))
    shapes = sorted(b["speech"].shape for b in batches)
    assert shapes == [(2, 500), (2, 2000)]
    long_batch = next(b for b in batches if b["speech"].shape[1] == 2000)
    # 1800 > audio_maxlen=1000, yet all 1800 samples survived
    assert int(long_batch["attention_mask"].sum(axis=1).max()) == 1800


def test_bucketed_remainders_respect_drop_remainder():
    loader = _loader(bucket_boundaries=[500, 2000])
    samples = _samples([300, 1800, 400, 450])  # bucket 500 gets 3, 2000 gets 1
    dropped = list(loader.batchify(iter(samples), seed=None, drop_remainder=True))
    kept = list(loader.batchify(iter(samples), seed=None, drop_remainder=False))
    assert len(dropped) == 1  # only the full 500-bucket batch
    assert len(kept) == 3  # + partial 500-bucket + partial 2000-bucket


def test_single_bucket_stream_identical_to_fixed_path():
    """Loss parity on short data, at the source: with one bucket equal to
    audio_maxlen every batch is byte-identical to the fixed-shape path, so
    the training step consumes exactly the same data."""
    samples = _samples([300, 700, 900, 1000])
    fixed = list(_loader().batchify(iter(samples), seed=7))
    bucketed = list(
        _loader(bucket_boundaries=[1000]).batchify(iter(samples), seed=7)
    )
    assert len(fixed) == len(bucketed) == 2
    for a, b in zip(fixed, bucketed):
        for key in ("speech", "labels", "attention_mask"):
            np.testing.assert_array_equal(a[key], b[key])


@pytest.mark.slow
def test_length_aware_step_matches_constant_length_on_unpadded_batch():
    """The bucketed mode's loss (masked + length-aware) must equal the
    reference-parity constant-length loss when there is no padding — the
    two semantics only diverge where padding exists."""
    config = Wav2Vec2Config(**TINY, dropout=0.0, apply_spec_augment=False,
                            survival_prob=1.0)
    b, l = 2, 1000
    batch = {
        "speech": jnp.asarray(
            np.random.default_rng(1).standard_normal((b, l)), jnp.float32
        ),
        "labels": jnp.tile(jnp.asarray([[5, 6, 7, 0]], jnp.int32), (b, 1)),
        "attention_mask": jnp.ones((b, l), jnp.float32),
    }
    rng = jax.random.PRNGKey(2)

    losses = {}
    for name, kwargs in (
        ("constant", dict(with_attention_mask=False, length_aware=False)),
        ("bucketed", dict(with_attention_mask=True, length_aware=True)),
    ):
        # fresh params per variant: the step donates its state buffers
        params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
        tx = create_optimizer(1e-4)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=jax.jit(tx.init)(params),
        )
        step = make_train_step(
            config, tx, division_factor=b, compute_dtype=jnp.float32, **kwargs
        )
        _, metrics = step(state, dict(batch), rng)
        losses[name] = float(metrics["loss"])
    assert np.isclose(losses["constant"], losses["bucketed"], rtol=1e-6), losses


@pytest.mark.slow
def test_train_cli_bucketed_end_to_end(tmp_path):
    """`cli.train --bucket_boundaries`: mixed-length corpus (including one
    utterance LONGER than audio_maxlen), two compiled shapes, finite loss,
    final model saved."""
    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac

    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC

    config = Wav2Vec2Config(**TINY, dropout=0.0, apply_spec_augment=False,
                            survival_prob=1.0)
    model_dir = str(tmp_path / "model")
    Wav2Vec2ForCTC(config, seed=0).save_pretrained(model_dir)

    chap = tmp_path / "1" / "1"
    chap.mkdir(parents=True)
    rng = np.random.default_rng(5)
    lines = []
    # audio_maxlen will be 2000; the 3000-sample clips only survive because
    # of the 3200 bucket
    for i, n in enumerate((1500, 1800, 3000, 2900)):
        sig = np.clip(
            1500 * np.sin(np.arange(n) / (3.0 + i)) + rng.normal(0, 50, n),
            -32768, 32767,
        ).astype(np.int64)
        (chap / f"1-1-{i:04d}.flac").write_bytes(
            encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7)
        )
        lines.append(f"1-1-{i:04d} SOME WORDS")
    (chap / "1-1.trans.txt").write_text("\n".join(lines))

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    ckpt_dir = str(tmp_path / "ckpts")
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.train",
            "--model_id", model_dir,
            "--train_dir", str(tmp_path),
            "--stage1_epochs", "1", "--stage2_epochs", "1",
            "--batch_size_per_device", "2",
            "--audio_maxlen", "2000",
            "--labels_maxlen", "16",
            "--bucket_boundaries", "2000", "3200",
            "--compute_dtype", "float32",
            "--ckpt_dir", ckpt_dir,
            "--log_dir", str(tmp_path / "logs"),
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    run_dirs = os.listdir(ckpt_dir)
    assert len(run_dirs) == 1
    assert os.path.isfile(
        os.path.join(ckpt_dir, run_dirs[0], "final", "config.json")
    )


def test_repad_batch_extends_audio_and_mask_only():
    """`repad_batch` (the multi-host bucket-consensus primitive) must pad
    speech with the pad id and the mask with zeros, leave labels untouched,
    be a no-op at the current length, and refuse to shrink."""
    import pytest

    loader = _loader(bucket_boundaries=[500, 2000], audio_pad_id=0)
    [batch] = list(
        loader.batchify(iter(_samples([300, 400])), drop_remainder=True)
    )
    assert batch["speech"].shape == (2, 500)

    out = loader.repad_batch(batch, 2000)
    assert out["speech"].shape == (2, 2000)
    assert out["attention_mask"].shape == (2, 2000)
    np.testing.assert_array_equal(out["speech"][:, :500], batch["speech"])
    assert np.all(out["speech"][:, 500:] == 0.0)
    assert np.all(out["attention_mask"][:, 500:] == 0.0)
    np.testing.assert_array_equal(out["labels"], batch["labels"])
    # true lengths preserved in the mask
    np.testing.assert_array_equal(
        out["attention_mask"].sum(axis=1), [300, 400]
    )

    assert loader.repad_batch(batch, 500) is batch  # no-op passthrough
    with pytest.raises(ValueError):
        loader.repad_batch(batch, 400)


@pytest.mark.slow
def test_repadded_batch_loss_equals_larger_bucket_assignment():
    """Consensus re-padding must be semantically a larger-bucket
    assignment: the length-aware train loss over a bucket-500 batch
    repadded to 2000 equals the loss over the same samples padded to 2000
    by the loader directly."""
    config = Wav2Vec2Config(**TINY)
    tx = create_optimizer(1e-3)

    def loss_of(batch):
        # fresh params per call: the step donates (consumes) the state
        params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=jax.jit(tx.init)(params),
        )
        step = make_train_step(
            config, tx, division_factor=2, with_attention_mask=True,
            length_aware=True, compute_dtype=jnp.float32,
        )
        _, metrics = step(
            state, {k: jnp.asarray(v) for k, v in batch.items()},
            jax.random.PRNGKey(9),
        )
        return float(metrics["loss"])

    samples = _samples([300, 400])
    small = _loader(bucket_boundaries=[500, 2000])
    [b_small] = list(small.batchify(iter(samples), drop_remainder=True))
    big = _loader(bucket_boundaries=[2000])
    [b_big] = list(big.batchify(iter(samples), drop_remainder=True))

    repadded = small.repad_batch(b_small, 2000)
    for k in ("speech", "labels", "attention_mask"):
        np.testing.assert_array_equal(repadded[k], b_big[k])
    assert loss_of(repadded) == loss_of(b_big)


def test_train_cli_refuses_untrainable_bucket_boundary(tmp_path):
    """A top bucket beyond the flash-attention training cap must fail
    LOUDLY at the CLI layer, not as an opaque compile error deep inside
    the first step (VERDICT r3 #5)."""
    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC
    from gsoc_wav2vec2_tpu.cli.train import TrainingArgs, main
    from gsoc_wav2vec2_tpu.ops.pallas.flash_attention import MAX_KV_TRAIN

    import pytest

    config = Wav2Vec2Config(**TINY)
    model_dir = str(tmp_path / "model")
    Wav2Vec2ForCTC(config, seed=0).save_pretrained(model_dir)

    # tiny [5,2] stack: 10 samples/frame -> 32769 frames needs ~327 700
    too_long = (MAX_KV_TRAIN + 2) * 10 + 20
    assert int(config.conv_output_length(too_long)) > MAX_KV_TRAIN
    args = TrainingArgs(
        model_id=model_dir,
        train_dir=str(tmp_path),
        bucket_boundaries=[2000, too_long],
        ckpt_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    with pytest.raises(ValueError, match="attention cap"):
        main(args)
