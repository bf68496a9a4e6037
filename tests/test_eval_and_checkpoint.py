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
