"""Streaming transcription (`streaming.StreamingTranscriber`,
`cli.transcribe --stream`): incremental feeds must reproduce the offline
long-form transcript EXACTLY (`evaluation.transcribe_long`), with
monotonically growing partials.  The reference has no streaming surface at
all (its inference notebook is one-shot fixed-shape,
`/root/reference/notebooks/wav2vec2-inference.ipynb`)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config, Wav2Vec2ForCTC
from gsoc_wav2vec2_tpu.evaluation import GreedyCTCEvaluator
from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
from gsoc_wav2vec2_tpu.streaming import StreamingTranscriber

import jax
import jax.numpy as jnp

TINY = dict(
    hidden_size=32, num_heads=2, num_layers=2, intermediate_size=64,
    filter_sizes=[16, 16], kernal_sizes=[10, 3], strides=[5, 2],
    dropout=0.0, survival_prob=1.0,
)
CHUNK, CONTEXT = 3000, 500


@pytest.fixture(scope="module")
def evaluator():
    config = Wav2Vec2Config(**TINY)
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    return GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)


def _audio(n, seed=0):
    return np.asarray(
        np.random.default_rng(seed).standard_normal(n), np.float32
    )


@pytest.mark.parametrize("total", [9500, 12000, CHUNK + 1])
def test_streaming_equals_transcribe_long(evaluator, total):
    audio = _audio(total)
    want = evaluator.transcribe_long(
        audio, chunk_samples=CHUNK, context_samples=CONTEXT
    )
    st = StreamingTranscriber(
        evaluator, chunk_samples=CHUNK, context_samples=CONTEXT
    )
    rng = np.random.default_rng(1)
    lo, partials = 0, []
    while lo < total:
        n = int(rng.integers(1, 1700))
        partials.append(st.feed(audio[lo : lo + n]))
        lo += n
    got = st.finish()
    assert got == want
    assert got, "random-weights argmax should produce a non-empty string"
    # committed text only ever grows (each partial is a prefix of the next)
    for a, b in zip(partials, partials[1:] + [got]):
        assert b.startswith(a)


def test_streaming_short_audio_matches_one_shot(evaluator):
    audio = _audio(CHUNK - 700, seed=3)
    want = evaluator.transcribe_long(
        audio, chunk_samples=CHUNK, context_samples=CONTEXT
    )
    st = StreamingTranscriber(
        evaluator, chunk_samples=CHUNK, context_samples=CONTEXT
    )
    st.feed(audio[:100])
    st.feed(audio[100:])
    assert st.finish() == want


def test_streaming_empty_and_errors(evaluator):
    st = StreamingTranscriber(
        evaluator, chunk_samples=CHUNK, context_samples=CONTEXT
    )
    assert st.finish() == ""
    with pytest.raises(ValueError, match="finished"):
        st.feed(np.zeros(10, np.float32))
    assert st.finish() == ""  # idempotent

    with pytest.raises(ValueError, match="exceed"):
        StreamingTranscriber(evaluator, chunk_samples=100, context_samples=60)

    beam_ev = GreedyCTCEvaluator(
        evaluator.config, evaluator.params, beam_width=4
    )
    with pytest.raises(ValueError, match="greedy"):
        StreamingTranscriber(beam_ev)


def test_streaming_memory_is_bounded(evaluator):
    """The buffer never retains more than ~one window behind the plan."""
    st = StreamingTranscriber(
        evaluator, chunk_samples=CHUNK, context_samples=CONTEXT
    )
    audio = _audio(40 * CHUNK, seed=5)
    max_buf = 0
    for lo in range(0, len(audio), 2048):
        st.feed(audio[lo : lo + 2048])
        max_buf = max(max_buf, st._buf.size)
    assert max_buf <= 2 * CHUNK + 2048


@pytest.mark.slow
def test_transcribe_cli_stream(tmp_path):
    """--stream: partial JSON lines then a final line equal to the offline
    transcript from the same CLI without --stream."""
    import wave

    model_dir = str(tmp_path / "model")
    Wav2Vec2ForCTC(Wav2Vec2Config(**TINY), seed=0).save_pretrained(model_dir)
    wav = str(tmp_path / "long.wav")
    sig = np.clip(
        3000 * np.sin(np.arange(9500) / 5.0)
        + np.random.default_rng(0).integers(-300, 300, 9500),
        -32768, 32767,
    ).astype(np.int16)
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    common = [
        sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.transcribe",
        "--model_dir", model_dir, wav,
        "--chunk_samples", str(CHUNK), "--context_samples", str(CONTEXT),
    ]
    offline = subprocess.run(
        common, capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )
    assert offline.returncode == 0, offline.stderr[-2000:]

    def json_lines(out):
        return [
            json.loads(l) for l in out.strip().splitlines()
            if l.startswith("{")  # skip loader chatter
        ]

    want = json_lines(offline.stdout)[-1]["transcription"]

    streamed = subprocess.run(
        common + ["--stream", "--stream_chunk_s", "0.1", "--timestamps"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )
    assert streamed.returncode == 0, streamed.stderr[-2000:]
    lines = json_lines(streamed.stdout)
    assert "transcription" in lines[-1] and lines[-1]["transcription"] == want
    partials = [l["partial"] for l in lines[:-1]]
    assert partials, "expected at least one partial update"
    for a, b in zip(partials, partials[1:] + [want]):
        assert b.startswith(a)
    # --stream --timestamps: every update carries committed word segments
    assert all("words" in l for l in lines[:-1])
    final_words = lines[-1]["words"]
    assert final_words and " ".join(
        w["word"] for w in final_words
    ).split() == want.split()
    assert all(
        set(w) >= {"word", "start", "end", "confidence"} for w in final_words
    )


@pytest.mark.parametrize("total", [9500, CHUNK - 700])
def test_streaming_words_match_offline_segments(evaluator, total):
    """word_timestamps mode: `finish()`-time words equal the offline
    `transcribe_long_segments` (text + frame spans exact; confidences to
    float addition order), and committed words never retract mid-stream
    (all but the still-open last word are final)."""
    audio = _audio(total, seed=5)
    want_text, want_words = evaluator.transcribe_long_segments(
        audio, chunk_samples=CHUNK, context_samples=CONTEXT
    )
    st = StreamingTranscriber(
        evaluator, chunk_samples=CHUNK, context_samples=CONTEXT,
        word_timestamps=True,
    )
    rng = np.random.default_rng(6)
    lo, snapshots = 0, []
    while lo < total:
        n = int(rng.integers(1, 1300))
        st.feed(audio[lo : lo + n])
        snapshots.append(st.words)
        lo += n
    final_text = st.finish()
    final_words = st.words

    assert final_text == want_text
    assert [
        (w["word"], w["start_frame"], w["end_frame"]) for w in final_words
    ] == [
        (w["word"], w["start_frame"], w["end_frame"]) for w in want_words
    ]
    for got, want in zip(final_words, want_words):
        assert got["confidence"] == pytest.approx(want["confidence"], abs=2e-4)
        assert got["start"] == pytest.approx(want["start"])
    # monotone commitment: every snapshot's words (minus its still-open
    # last word) are a prefix of the final words
    for snap in snapshots:
        stable = snap[:-1]
        assert [
            (w["word"], w["start_frame"]) for w in stable
        ] == [
            (w["word"], w["start_frame"]) for w in final_words[: len(stable)]
        ]


def test_streaming_words_requires_flag(evaluator):
    st = StreamingTranscriber(
        evaluator, chunk_samples=CHUNK, context_samples=CONTEXT
    )
    with pytest.raises(ValueError, match="word_timestamps"):
        _ = st.words


def test_stream_rejects_beam(tmp_path):
    model_dir = str(tmp_path / "model")
    Wav2Vec2ForCTC(Wav2Vec2Config(**TINY), seed=0).save_pretrained(model_dir)
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.transcribe",
         "--model_dir", model_dir, "x.wav", "--stream", "--beam_width", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert r.returncode != 0 and "greedy" in r.stderr
