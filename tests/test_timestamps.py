"""Word-level timestamps (`decoding.ctc_word_segments`,
`GreedyCTCEvaluator.predict_segments` / `transcribe_long_segments`).

Oracle: HuggingFace's `Wav2Vec2CTCTokenizer.decode(output_word_offsets=
True)` — the de-facto convention for CTC word timing (char run spans in
frames; a word spans first-char start to last-char end).  The reference
decodes to a bare string only (`/root/reference/src/wav2vec2/
processor.py:71-89`)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config
from gsoc_wav2vec2_tpu.data.processor import VOCAB, Wav2Vec2Processor
from gsoc_wav2vec2_tpu.decoding import ctc_word_segments
from gsoc_wav2vec2_tpu.evaluation import GreedyCTCEvaluator
from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params

TOKENIZER = Wav2Vec2Processor(is_tokenizer=True)
FRAME_S = 0.02


def _segments(ids, probs=None, frame_seconds=FRAME_S):
    return ctc_word_segments(
        ids,
        frame_probs=probs,
        pad_id=0,
        delimiter_id=TOKENIZER.delimiter_id,
        id_to_token=TOKENIZER.id_to_token_mapping,
        frame_seconds=frame_seconds,
    )


@pytest.fixture(scope="module")
def tiny():
    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    return config, params


def test_word_segments_match_hf_oracle(tmp_path):
    """Words, frame offsets AND text equal HF's output_word_offsets on
    random frame paths over {pad, delimiter, letters}."""
    transformers = pytest.importorskip("transformers")
    vocab_file = tmp_path / "vocab.json"
    vocab_file.write_text(json.dumps(VOCAB))
    hf_tok = transformers.Wav2Vec2CTCTokenizer(
        str(vocab_file), word_delimiter_token="|", pad_token="<pad>",
        unk_token="<unk>", bos_token="<s>", eos_token="</s>",
    )
    rng = np.random.default_rng(0)
    # ids drawn from pad/delimiter/letters only (1,2,3 are sequence
    # specials HF's decode strips differently; the CTC argmax of a
    # trained model never emits them)
    pool = np.array([0, 4] + list(range(5, 32)))
    for trial in range(40):
        length = int(rng.integers(1, 80))
        # bias runs: repeat each draw 1-3 frames
        draws = pool[rng.integers(0, len(pool), size=length)]
        ids = np.repeat(draws, rng.integers(1, 4, size=length))
        hf = hf_tok.decode(list(ids), output_word_offsets=True)
        text, words = _segments(ids)
        assert text == hf.text, (trial, list(ids))
        hf_words = [
            (w["word"], int(w["start_offset"]), int(w["end_offset"]))
            for w in hf.word_offsets
        ]
        ours = [(w["word"], w["start_frame"], w["end_frame"]) for w in words]
        assert ours == hf_words, (trial, list(ids))


def test_word_segments_hand_case():
    """E E <pad> T | | A -> 'ET A': ET spans frames [0,4) (the blank
    between its chars is inside the span), A spans [6,7); confidences
    average ONLY the char-run frames."""
    ids = [5, 5, 0, 6, 4, 4, 7]
    probs = np.array([0.9, 0.8, 0.5, 0.6, 1.0, 1.0, 0.4], np.float32)
    text, words = _segments(ids, probs)
    assert text == "ET A"
    assert [w["word"] for w in words] == ["ET", "A"]
    et, a = words
    assert (et["start_frame"], et["end_frame"]) == (0, 4)
    assert (a["start_frame"], a["end_frame"]) == (6, 7)
    assert et["start"] == 0.0 and et["end"] == pytest.approx(0.08)
    assert a["start"] == pytest.approx(0.12) and a["end"] == pytest.approx(0.14)
    # ET frames: 0,1 (E run) and 3 (T run) — frame 2 is blank, excluded
    assert et["confidence"] == pytest.approx((0.9 + 0.8 + 0.6) / 3, abs=1e-4)
    assert a["confidence"] == pytest.approx(0.4, abs=1e-4)


def test_word_segments_edge_cases():
    # all blank -> empty
    assert _segments([0, 0, 0]) == ("", [])
    # delimiters only -> empty word list, whitespace-stripped text
    assert _segments([4, 0, 4]) == ("", [])
    # no probs -> no confidence key
    _, words = _segments([5, 6])
    assert words and "confidence" not in words[0]


def test_predict_segments_consistent_with_predict_batch(tiny):
    config, params = tiny
    ev = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    speech = rng.standard_normal((3, 4000)).astype(np.float32)
    lengths = np.array([4000, 2500, 3200], np.int64)
    texts = ev.predict_batch(speech, lengths)
    segs = ev.predict_segments(speech, lengths)
    assert len(segs) == 3
    for text, (seg_text, words) in zip(texts, segs):
        assert seg_text == text
        assert " ".join(w["word"] for w in words).split() == text.split()
        prev_end = 0
        for w in words:
            assert 0 <= w["start_frame"] < w["end_frame"]
            assert w["start_frame"] >= prev_end  # words never overlap
            prev_end = w["end_frame"]
            assert 0.0 < w["confidence"] <= 1.0
            assert w["start"] == pytest.approx(
                w["start_frame"] * ev.frame_seconds, abs=1e-9
            )


def test_predict_segments_rejects_beam(tiny):
    config, params = tiny
    beam = GreedyCTCEvaluator(
        config, params, compute_dtype=jnp.float32, beam_width=4
    )
    with pytest.raises(ValueError, match="greedy"):
        beam.predict_segments(np.zeros((1, 4000), np.float32))
    with pytest.raises(ValueError, match="greedy"):
        beam.transcribe_long_segments(np.zeros(4000, np.float32))


def test_transcribe_long_segments_consistency(tiny):
    """The segments long-form path walks the SAME window plan as
    `transcribe_long`, so their texts must be identical at identical
    chunking; word frame indices must be GLOBAL (reach past the first
    window) and strictly tile forward.  (Chunked-vs-unchunked string
    equality is not assertable on a random-weight model — attention is
    global within a window, so different windowing legitimately changes
    near-tie argmaxes; `test_transcribe_long_boundary_consistency` makes
    the same concession.)"""
    config, params = tiny
    ev = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    audio = np.zeros(24000, np.float32)
    for start in range(0, 24000, 3000):
        audio[start : start + 1500] = rng.standard_normal(1500)
    text, words = ev.transcribe_long_segments(
        audio, chunk_samples=8000, context_samples=1000
    )
    assert text == ev.transcribe_long(
        audio, chunk_samples=8000, context_samples=1000
    )
    total_frames = int(config.conv_output_length(24000))
    first_window_frames = int(config.conv_output_length(8000))
    assert words, "silence-separated bursts must produce words"
    assert max(w["end_frame"] for w in words) > first_window_frames
    assert max(w["end_frame"] for w in words) <= total_frames
    prev_end = 0
    for w in words:
        assert prev_end <= w["start_frame"] < w["end_frame"]
        prev_end = w["end_frame"]
    # no-split chunking equals the unchunked batch path exactly
    whole = ev.transcribe_long_segments(audio, chunk_samples=24000)
    assert whole == ev.predict_segments(audio[None, :])[0]
    # and the short-audio delegate agrees with predict_segments
    short = audio[:5000]
    assert ev.transcribe_long_segments(short, chunk_samples=8000) == \
        ev.predict_segments(short[None, :])[0]


@pytest.mark.slow
def test_transcribe_cli_timestamps(tmp_path):
    """`cli.transcribe --timestamps` emits a words array; --beam_width
    combination is rejected."""
    import os
    import subprocess
    import sys
    import wave

    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC

    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    model_dir = str(tmp_path / "model")
    Wav2Vec2ForCTC(config, seed=0).save_pretrained(model_dir)
    pcm = np.clip(
        1800 * np.sin(np.arange(12000) / 6.0), -32768, 32767
    ).astype("<i2")
    clip = tmp_path / "clip.wav"
    with wave.open(str(clip), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.transcribe",
            "--model_dir", model_dir, "--timestamps", str(clip),
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert isinstance(report["words"], list)
    for w in report["words"]:
        assert set(w) >= {"word", "start", "end", "confidence"}

    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.transcribe",
            "--model_dir", model_dir, "--timestamps", "--beam_width", "4",
            str(clip),
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )
    assert result.returncode != 0
    assert "greedy" in result.stderr
