"""Unit coverage for the round-2 driver fixes: dynamic learning rate,
multi-host lockstep/sync helpers, device probes, unique run ids, prefetch
abandonment, and loud missing-vocab failure.
"""

import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_set_learning_rate_changes_update_magnitude():
    from gsoc_wav2vec2_tpu.training import TrainState, create_optimizer, trainable_mask
    from gsoc_wav2vec2_tpu.training.state import get_learning_rate, set_learning_rate

    params = {"a": {"w": jnp.ones((4,))}, "head": {"w": jnp.ones((4,))}}
    mask = trainable_mask(params, ("a",))  # freeze subtree "a"
    tx = create_optimizer(1e-2, mask, dynamic_lr=True)
    opt_state = tx.init(params)
    assert get_learning_rate(opt_state) == pytest.approx(1e-2)

    grads = jax.tree.map(jnp.ones_like, params)
    up1, opt_state = tx.update(grads, opt_state, params)
    # Adam first step moves by ~lr regardless of grad scale
    assert float(jnp.abs(up1["head"]["w"][0])) == pytest.approx(1e-2, rel=1e-3)
    assert float(jnp.abs(up1["a"]["w"][0])) == 0.0  # frozen

    opt_state = set_learning_rate(opt_state, 5e-3)
    assert get_learning_rate(opt_state) == pytest.approx(5e-3)
    up2, opt_state = tx.update(grads, opt_state, params)
    assert float(jnp.abs(up2["head"]["w"][0])) == pytest.approx(5e-3, rel=1e-3)


def test_set_learning_rate_inside_jitted_step_no_structure_change():
    """set_learning_rate must return a state the already-jitted step accepts
    (same pytree structure, shapes, dtypes)."""
    import optax

    from gsoc_wav2vec2_tpu.training import create_optimizer
    from gsoc_wav2vec2_tpu.training.state import set_learning_rate

    params = {"w": jnp.ones((3,))}
    tx = create_optimizer(1e-3, dynamic_lr=True)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        grads = jax.tree.map(jnp.ones_like, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    params, opt_state = step(params, opt_state)
    new_state = set_learning_rate(opt_state, 1e-4)
    assert jax.tree_util.tree_structure(new_state) == jax.tree_util.tree_structure(opt_state)
    params, _ = step(params, new_state)  # must not fail or re-trace-error
    assert np.all(np.isfinite(np.asarray(params["w"])))


def test_lockstep_and_sync_run_id_single_process_passthrough():
    from gsoc_wav2vec2_tpu.parallel import multihost

    items = [1, 2, 3]
    assert list(multihost.lockstep_batches(iter(items))) == items
    assert multihost.sync_run_id("my-run-42") == "my-run-42"


def test_device_probes_cpu():
    from gsoc_wav2vec2_tpu.utils import is_gpu_available, is_tpu_available

    # conftest forces the CPU backend
    assert is_tpu_available() is False
    assert is_gpu_available() is False


def test_metric_logger_unique_run_ids(tmp_path):
    from gsoc_wav2vec2_tpu.utils import MetricLogger

    a = MetricLogger(str(tmp_path / "a"))
    b = MetricLogger(str(tmp_path / "b"))
    assert a.run_id != "local" and a.run_id != b.run_id
    a.finish(), b.finish()


def test_prefetch_producer_stops_when_consumer_abandons():
    from gsoc_wav2vec2_tpu.data.loaders import _prefetch

    produced = []
    done = threading.Event()

    def source():
        try:
            for i in range(10_000):
                produced.append(i)
                yield i
        finally:
            done.set()

    gen = _prefetch(source(), depth=2)
    next(gen)
    gen.close()  # consumer walks away
    # producer must unblock from its full queue and exit
    assert done.wait(timeout=5.0), "producer thread still alive after close()"
    assert len(produced) < 100  # it did not run the source dry


def test_processor_missing_vocab_path_fails_loudly(tmp_path):
    from gsoc_wav2vec2_tpu.data.processor import Wav2Vec2Processor

    with pytest.raises(OSError):
        Wav2Vec2Processor(is_tokenizer=True, vocab_path=str(tmp_path / "nope.json"))


def test_dummy_data_path_env_hook(monkeypatch, tmp_path):
    """Reference `main.py:24-27`: DUMMY_DATA_PATH feeds a local raw corpus
    when no explicit data flags are given."""
    from gsoc_wav2vec2_tpu.cli.train import TrainingArgs

    monkeypatch.delenv("DATA_BUCKET_NAME", raising=False)
    monkeypatch.setenv("DUMMY_DATA_PATH", str(tmp_path))
    args = TrainingArgs()
    assert args.train_dir == str(tmp_path)
    # explicit flags win over the env hook
    args2 = TrainingArgs(train_dir="/explicit")
    assert args2.train_dir == "/explicit"


def test_lockstep_precounted_single_process_passthrough():
    from gsoc_wav2vec2_tpu.parallel import multihost

    items = [1, 2, 3]
    assert list(multihost.lockstep_batches(iter(items), num_batches=3)) == items


def test_loader_num_batches_matches_stream(tmp_path):
    """`num_batches()` (the lockstep pre-count) must equal the number of
    batches the loader actually yields, for both drop_remainder settings,
    and stay correct under per-host sharding."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac

    from gsoc_wav2vec2_tpu.data.loaders import (
        LibriSpeechDataLoader,
        LibriSpeechDataLoaderArgs,
    )

    chap = tmp_path / "1" / "1"
    chap.mkdir(parents=True)
    sig = (1000 * np.sin(np.arange(2000) / 5.0)).astype(np.int64)
    lines = []
    for i in range(5):
        (chap / f"1-1-{i:04d}.flac").write_bytes(
            encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7)
        )
        lines.append(f"1-1-{i:04d} HELLO")
    (chap / "1-1.trans.txt").write_text("\n".join(lines))

    for shard_count, shard_index in ((1, 0), (2, 1)):
        loader = LibriSpeechDataLoader(
            LibriSpeechDataLoaderArgs(
                data_dir=str(tmp_path), batch_size=2, audio_maxlen=2000,
                labels_maxlen=16,
            ),
            shard_index=shard_index,
            shard_count=shard_count,
        )
        for drop in (True, False):
            want = loader.num_batches(drop_remainder=drop)
            got = sum(1 for _ in loader(drop_remainder=drop))
            assert want == got, (shard_count, drop, want, got)
    # tfrecord source: unknown without reading -> None
    tf_loader = LibriSpeechDataLoader(
        LibriSpeechDataLoaderArgs(
            from_tfrecords=True, tfrecords=["/nonexistent.tfrecord"]
        )
    )
    assert tf_loader.num_batches() is None
