"""CTC-loss oracle parity: `ops/ctc.py` vs torch (and TF when present).

The reference validated its loss against HF torch at atol 1e-3
(`/root/reference/tests/test_wav2vec2.py:191-237`, `test_loss_autograph`;
loss impl `src/wav2vec2/losses.py:29-45`).  Loss-semantics bugs — log-softmax
handling, blank conventions, length conventions — would silently poison every
training run, so per-sample values are checked against
`torch.nn.functional.ctc_loss` in both the constant-length (reference-parity)
and length-aware modes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gsoc_wav2vec2_tpu.ops.ctc import CTCLoss, ctc_loss_fn  # noqa: E402

B, T, V = 4, 50, 32
PAD = 0  # blank == pad == 0, reference `losses.py:41`


def _random_case(seed, logit_lengths=None, label_lengths=None):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    if logit_lengths is None:
        logit_lengths = np.full((B,), T, np.int32)
    if label_lengths is None:
        label_lengths = rng.integers(3, 12, size=B).astype(np.int32)
    labels = np.zeros((B, 16), np.int32)
    for i, n in enumerate(label_lengths):
        labels[i, :n] = rng.integers(1, V, size=n)  # non-blank symbols
    return logits, labels, np.asarray(logit_lengths, np.int32), label_lengths


def _torch_per_sample(logits, labels, logit_lengths, label_lengths):
    log_probs = torch.log_softmax(
        torch.from_numpy(logits), dim=-1
    ).transpose(0, 1)  # (T, B, V)
    return torch.nn.functional.ctc_loss(
        log_probs,
        torch.from_numpy(labels),
        torch.from_numpy(logit_lengths.astype(np.int64)),
        torch.from_numpy(label_lengths.astype(np.int64)),
        blank=PAD,
        reduction="none",
        zero_infinity=False,
    ).numpy()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_per_sample_loss_matches_torch_full_length(seed):
    logits, labels, logit_lengths, label_lengths = _random_case(seed)
    ours = np.asarray(
        ctc_loss_fn(jnp.asarray(logits), jnp.asarray(labels),
                    jnp.asarray(logit_lengths), PAD)
    )
    oracle = _torch_per_sample(logits, labels, logit_lengths, label_lengths)
    np.testing.assert_allclose(ours, oracle, atol=1e-3, rtol=1e-4)


def test_per_sample_loss_matches_torch_ragged_logit_lengths():
    logit_lengths = np.array([50, 37, 44, 29], np.int32)
    logits, labels, logit_lengths, label_lengths = _random_case(
        7, logit_lengths=logit_lengths
    )
    ours = np.asarray(
        ctc_loss_fn(jnp.asarray(logits), jnp.asarray(labels),
                    jnp.asarray(logit_lengths), PAD)
    )
    oracle = _torch_per_sample(logits, labels, logit_lengths, label_lengths)
    np.testing.assert_allclose(ours, oracle, atol=1e-3, rtol=1e-4)


def test_ctc_loss_class_constant_length_sum_division():
    """Reference semantics: constant logit length from the conv-stride
    arithmetic (padding frames included), SUM over batch / division_factor
    (`losses.py:29-30,45-56`, `main.py:196-200`)."""
    from gsoc_wav2vec2_tpu.models.config import Wav2Vec2Config

    config = Wav2Vec2Config()
    audio_len = 16000
    t = int(config.conv_output_length(audio_len))
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(B, t, V)).astype(np.float32)
    label_lengths = rng.integers(3, 12, size=B).astype(np.int32)
    labels = np.zeros((B, 16), np.int32)
    for i, n in enumerate(label_lengths):
        labels[i, :n] = rng.integers(1, V, size=n)

    division = 64
    loss = CTCLoss(config, (B, audio_len), division_factor=division)(
        jnp.asarray(labels), jnp.asarray(logits)
    )
    oracle = _torch_per_sample(
        logits, labels, np.full((B,), t, np.int32), label_lengths
    )
    np.testing.assert_allclose(
        float(loss), float(oracle.sum()) / division, atol=1e-3, rtol=1e-4
    )


def test_ctc_loss_class_length_aware_matches_torch():
    """`length_aware=True` derives per-sample logit lengths from the
    attention mask — the upgrade over the reference's constant-length quirk."""
    from gsoc_wav2vec2_tpu.models.config import Wav2Vec2Config

    config = Wav2Vec2Config()
    audio_len = 16000
    t = int(config.conv_output_length(audio_len))
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(B, t, V)).astype(np.float32)
    sample_lengths = np.array([16000, 12000, 9000, 15000], np.int32)
    mask = (np.arange(audio_len)[None, :] < sample_lengths[:, None]).astype(
        np.float32
    )
    label_lengths = rng.integers(3, 10, size=B).astype(np.int32)
    labels = np.zeros((B, 16), np.int32)
    for i, n in enumerate(label_lengths):
        labels[i, :n] = rng.integers(1, V, size=n)

    loss = CTCLoss(config, (B, audio_len), division_factor=B, length_aware=True)(
        jnp.asarray(labels), jnp.asarray(logits), attention_mask=jnp.asarray(mask)
    )
    frame_lengths = np.asarray(
        config.conv_output_length(sample_lengths), np.int32
    )
    assert (frame_lengths < t).any()  # the mask actually shortens some rows
    oracle = _torch_per_sample(logits, labels, frame_lengths, label_lengths)
    np.testing.assert_allclose(
        float(loss), float(oracle.sum()) / B, atol=1e-3, rtol=1e-4
    )


def test_loss_matches_tf_ctc_loss_if_available():
    """Secondary oracle: `tf.nn.ctc_loss` — the exact function the reference
    wrapped (`losses.py:43`)."""
    tf = pytest.importorskip("tensorflow")

    logits, labels, logit_lengths, label_lengths = _random_case(11)
    ours = np.asarray(
        ctc_loss_fn(jnp.asarray(logits), jnp.asarray(labels),
                    jnp.asarray(logit_lengths), PAD)
    )
    oracle = tf.nn.ctc_loss(
        labels=tf.constant(labels),
        logits=tf.constant(logits),
        label_length=tf.constant(label_lengths),
        logit_length=tf.constant(logit_lengths),
        logits_time_major=False,
        blank_index=PAD,
    ).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-3, rtol=1e-4)
