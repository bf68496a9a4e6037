"""WER metric, evaluation harness, and Orbax checkpoint round-trip tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config
from gsoc_wav2vec2_tpu.evaluation import GreedyCTCEvaluator, default_buckets
from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
from gsoc_wav2vec2_tpu.utils.metrics import cer, edit_distance, wer


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], ["a"]) == 1
    assert edit_distance(["a", "b"], ["a", "b"]) == 0


def test_wer_matches_hand_computed():
    refs = ["the cat sat on the mat", "hello world"]
    hyps = ["the cat sat on mat", "hello word"]
    # pair 1: one deletion over 6 words; pair 2: one substitution over 2
    assert wer(refs, hyps) == pytest.approx(2 / 8)
    assert wer(refs, refs) == 0.0
    assert cer(["abc"], ["axc"]) == pytest.approx(1 / 3)


def test_wer_rejects_mismatched_or_empty():
    with pytest.raises(ValueError):
        wer(["a"], [])
    with pytest.raises(ValueError):
        wer([""], [""])


@pytest.fixture(scope="module")
def tiny_model():
    config = Wav2Vec2Config(
        hidden_size=64,
        num_heads=4,
        num_layers=2,
        intermediate_size=128,
        filter_sizes=[32, 32],
        kernal_sizes=[10, 3],
        strides=[5, 2],
    )
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    return config, params


def test_evaluator_padding_invariance_robust(tiny_model):
    """With the attention-mask path (robust family: per-frame LayerNorm, not
    time-global GroupNorm), padding must not change valid-region frame
    predictions except at the conv receptive-field boundary.  This is the
    property that lets bucketed eval match no-padding quality — and exactly
    the property the base/GroupNorm family LACKS, which is why the
    reference's constant-pad eval degrades 3.3%%->6%% WER (SURVEY.md §6)."""
    config = Wav2Vec2Config(
        hidden_size=64,
        num_heads=4,
        num_layers=2,
        intermediate_size=128,
        filter_sizes=[32, 32],
        kernal_sizes=[10, 3],
        strides=[5, 2],
        feature_extractor_norm_type="layer",
        attention_norm_type="prenorm",
        is_robust=True,
        conv_bias=True,
    )
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    evaluator = GreedyCTCEvaluator(
        config, params, compute_dtype=jnp.float32, use_attention_mask=True
    )
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(4000).astype(np.float32)

    step = evaluator._step(True)
    mask1 = np.ones((1, 4000), np.float32)
    preds1, len1 = step(evaluator.params, jnp.asarray(audio[None, :]), jnp.asarray(mask1))

    padded = np.zeros((1, 6000), np.float32)
    padded[0, :4000] = audio
    mask2 = np.zeros((1, 6000), np.float32)
    mask2[0, :4000] = 1.0
    preds2, len2 = step(evaluator.params, jnp.asarray(padded), jnp.asarray(mask2))

    n = int(len1[0])
    assert int(len2[0]) == n
    # all valid frames agree except possibly the conv boundary tail
    # (receptive field 20 samples / stride 10 -> 2 frames)
    np.testing.assert_array_equal(
        np.asarray(preds1)[0, : n - 2], np.asarray(preds2)[0, : n - 2]
    )


def test_base_family_is_padding_variant(tiny_model):
    """Documents the reference quirk: GroupNorm-over-time makes the base
    family's outputs depend on padding length (no mask support)."""
    config, params = tiny_model
    evaluator = GreedyCTCEvaluator(
        config, params, compute_dtype=jnp.float32, use_attention_mask=False
    )
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(4000).astype(np.float32)
    unpadded = evaluator.predict_batch(audio[None, :])[0]
    padded = np.zeros((1, 16000), np.float32)
    padded[0, :4000] = audio
    padded_pred = evaluator.predict_batch(padded, np.array([4000]))[0]
    # (random params; with real weights the divergence is the 3.3->6 WER gap)
    assert isinstance(unpadded, str) and isinstance(padded_pred, str)


def test_evaluator_bucketed_end_to_end(tiny_model):
    config, params = tiny_model
    evaluator = GreedyCTCEvaluator(
        config, params, compute_dtype=jnp.float32, use_attention_mask=False
    )
    rng = np.random.default_rng(1)
    samples = [
        (rng.standard_normal(n).astype(np.float32), "SOME REFERENCE TEXT")
        for n in (3000, 4500, 8000)
    ]
    score, n = evaluator.evaluate_bucketed(
        iter(samples), batch_size=2, buckets=[4000, 8000]
    )
    assert n == 3
    assert 0.0 <= score  # random params: arbitrary but valid WER


def test_default_buckets_are_16k_multiples():
    buckets = default_buckets()
    assert all(b % 16000 == 0 for b in buckets)
    assert buckets[-1] >= 400000


def test_checkpoint_roundtrip(tmp_path, tiny_model):
    from gsoc_wav2vec2_tpu.training import TrainState, create_optimizer
    from gsoc_wav2vec2_tpu.training.checkpoint import CheckpointManager

    config, params = tiny_model
    tx = create_optimizer(1e-3)
    state = TrainState(
        step=jnp.asarray(7, jnp.int32), params=params, opt_state=tx.init(params)
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state, wait=True)
    assert mgr.latest_step() == 7

    restored = mgr.restore(state)
    assert int(restored.step) == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params,
        restored.params,
    )
    # optimizer slots round-trip too (the thing the reference loses)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.opt_state,
        restored.opt_state,
    )
    mgr.close()


def test_checkpoint_restore_missing_raises(tmp_path, tiny_model):
    from gsoc_wav2vec2_tpu.training import TrainState, create_optimizer
    from gsoc_wav2vec2_tpu.training.checkpoint import CheckpointManager

    config, params = tiny_model
    tx = create_optimizer(1e-3)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params, opt_state=tx.init(params)
    )
    mgr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore(state)
    mgr.close()


@pytest.mark.slow
def test_mesh_sharded_eval_matches_single_device(tiny_model):
    """Round-3 upgrade: WER evaluation sharded over the full 8-device mesh
    (data axis) must produce IDENTICAL hypotheses and WER to the
    single-device evaluator — including ragged final batches whose rows pad
    up to the data-axis quantum."""
    from gsoc_wav2vec2_tpu.parallel import make_mesh

    config, params = tiny_model
    rng = np.random.default_rng(5)
    # 11 samples of varying length: exercises the row-padding path
    # (11 % 8 != 0) in both padded and bucketed modes
    samples = [
        (
            rng.standard_normal(rng.integers(900, 2000)).astype(np.float32),
            "SOME REFERENCE TEXT",
        )
        for _ in range(11)
    ]

    single = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    mesh = make_mesh(model=1)
    sharded = GreedyCTCEvaluator(
        config, params, compute_dtype=jnp.float32, mesh=mesh
    )

    for mode in ("evaluate_padded", "evaluate_bucketed"):
        kwargs = (
            {"pad_to": 2000, "batch_size": 4}
            if mode == "evaluate_padded"
            else {"buckets": [1000, 2000], "batch_size": 4}
        )
        w1, n1 = getattr(single, mode)(iter(samples), **kwargs)
        w2, n2 = getattr(sharded, mode)(iter(samples), **kwargs)
        assert n1 == n2 == len(samples)
        assert w1 == w2, f"{mode}: sharded WER {w2} != single-device {w1}"

    # predict_batch hypotheses must agree row-for-row too
    speech = np.zeros((3, 2000), np.float32)
    lengths = np.asarray([1500, 2000, 950])
    for i, (audio, _) in enumerate(samples[:3]):
        speech[i, : min(len(audio), 2000)] = audio[:2000]
    assert single.predict_batch(speech, lengths) == sharded.predict_batch(
        speech, lengths
    )


@pytest.mark.slow
def test_evaluate_cli_reads_tfrecords(tmp_path):
    """`cli.evaluate --tfrecords` scores the same shards training consumes
    (round-3: the eval CLI previously only read raw corpora)."""
    import json
    import os
    import subprocess
    import sys

    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC
    from gsoc_wav2vec2_tpu.data import native_io
    from gsoc_wav2vec2_tpu.data.processor import Wav2Vec2Processor

    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    model_dir = str(tmp_path / "model")
    Wav2Vec2ForCTC(config, seed=0).save_pretrained(model_dir)

    tok = Wav2Vec2Processor(is_tokenizer=True)
    rng = np.random.default_rng(3)
    shard = str(tmp_path / "eval-0.tfrecord")
    with native_io.TFRecordWriter(shard) as w:
        for text in ("HELLO WORLD", "TINY MODEL", "SOME WORDS HERE"):
            speech = rng.standard_normal(1600).astype(np.float32)
            w.write(speech, np.asarray(tok(text), np.int32))

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.evaluate",
            "--model_dir", model_dir,
            "--tfrecords", str(tmp_path / "*.tfrecord"),
            "--mode", "padded", "--pad_to", "1600",
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=600,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert report["num_samples"] == 3
    assert 0.0 <= report["wer"] <= 1.0


@pytest.mark.slow
def test_evaluate_cli_sharded_matches_unsharded(tmp_path):
    """`cli.evaluate --sharded` (data-parallel mesh over all 8 virtual
    devices) must report the same WER as the default single-device run."""
    import json
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac

    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC

    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    model_dir = str(tmp_path / "model")
    Wav2Vec2ForCTC(config, seed=0).save_pretrained(model_dir)

    chap = tmp_path / "1" / "1"
    chap.mkdir(parents=True)
    rng = np.random.default_rng(9)
    lines = []
    for i in range(5):  # 5 samples: exercises the ragged final batch
        n = int(rng.integers(1200, 2000))
        sig = np.clip(
            1500 * np.sin(np.arange(n) / (3.0 + i)), -32768, 32767
        ).astype(np.int64)
        (chap / f"1-1-{i:04d}.flac").write_bytes(
            encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7)
        )
        lines.append(f"1-1-{i:04d} SOME WORDS HERE")
    (chap / "1-1.trans.txt").write_text("\n".join(lines))

    def run(extra):
        env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        result = subprocess.run(
            [
                sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.evaluate",
                "--model_dir", model_dir, "--data_dir", str(tmp_path),
                "--mode", "padded", "--pad_to", "2000", "--batch_size", "4",
            ] + extra,
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=600,
        )
        assert result.returncode == 0, result.stderr[-3000:]
        return json.loads(result.stdout.strip().splitlines()[-1])

    plain = run([])
    sharded = run(["--sharded"])
    assert plain["num_samples"] == sharded["num_samples"] == 5
    assert plain["wer"] == sharded["wer"]


def test_evaluator_parks_params_on_device(tiny_model):
    """The evaluator must `device_put` params ONCE at construction:
    `jax.jit` copies numpy inputs host->device on EVERY call, so
    host-resident params re-upload the whole model per dispatch (~360 MB
    for base-95M — measured ~16 s per serving request over a tunneled
    chip, flat across payload sizes, before this fix; COMPONENTS.md
    §Round-5 SERVING).  Predictions must be unchanged."""
    from gsoc_wav2vec2_tpu.parallel import make_mesh

    config, params = tiny_model
    # pass host numpy params explicitly — the constructor must devicize
    host_params = jax.tree.map(np.asarray, params)
    ev = GreedyCTCEvaluator(config, host_params, compute_dtype=jnp.float32)
    leaves = jax.tree.leaves(ev.params)
    assert leaves and all(isinstance(x, jax.Array) for x in leaves)

    mesh = make_mesh(model=1)
    sharded = GreedyCTCEvaluator(
        config, host_params, compute_dtype=jnp.float32, mesh=mesh
    )
    for x in jax.tree.leaves(sharded.params):
        assert isinstance(x, jax.Array)
        # replicated over the mesh: every device holds the full leaf
        assert x.sharding.is_fully_replicated

    speech = np.random.default_rng(0).standard_normal((3, 1600)).astype(
        np.float32
    )
    want = GreedyCTCEvaluator(
        config, params, compute_dtype=jnp.float32
    ).predict_batch(speech)
    assert ev.predict_batch(speech) == want
    assert sharded.predict_batch(speech) == want
