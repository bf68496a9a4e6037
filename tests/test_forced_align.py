"""CTC forced alignment (`decoding.ctc_forced_align`,
`GreedyCTCEvaluator.align_segments`, `cli.align`).

Oracle: exhaustive enumeration of every V^T frame path that collapses to
the target labels — exponential, so trellis properties are pinned on tiny
shapes, then the evaluator/CLI surfaces are exercised on a tiny model.
The reference has no alignment surface (its decode is a bare string,
`/root/reference/src/wav2vec2/processor.py:71-89`)."""

import itertools
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config
from gsoc_wav2vec2_tpu.data.processor import Wav2Vec2Processor
from gsoc_wav2vec2_tpu.decoding import ctc_forced_align, ctc_word_segments
from gsoc_wav2vec2_tpu.evaluation import GreedyCTCEvaluator
from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params

TOKENIZER = Wav2Vec2Processor(is_tokenizer=True)


def brute_force_align(log_probs, labels, blank_id=0):
    """Best single path (max, not sum) collapsing to `labels`, by
    enumerating all V^T paths — test oracle only."""
    log_probs = np.asarray(log_probs, np.float64)
    t_len, vocab = log_probs.shape
    best_path, best_score = None, -np.inf
    for path in itertools.product(range(vocab), repeat=t_len):
        collapsed, prev = [], None
        for s in path:
            if s != blank_id and s != prev:
                collapsed.append(s)
            prev = s
        if collapsed != list(labels):
            continue
        score = sum(log_probs[t, s] for t, s in enumerate(path))
        if score > best_score:
            best_path, best_score = path, score
    return best_path, best_score


@pytest.mark.parametrize(
    "labels", [[1], [1, 2], [1, 1], [2, 1, 2], [1, 1, 2]]
)
def test_matches_brute_force_oracle(labels):
    rng = np.random.default_rng(hash(tuple(labels)) % 2**31)
    for trial in range(4):
        log_probs = np.log(
            rng.dirichlet(np.ones(4), size=6).astype(np.float64)
        )
        path, score = ctc_forced_align(log_probs, labels, blank_id=0)
        oracle_path, oracle_score = brute_force_align(log_probs, labels)
        assert oracle_path is not None
        assert score == pytest.approx(oracle_score, abs=1e-9), (trial, labels)
        # score ties between distinct paths have measure zero under a
        # continuous draw, so the argmax path itself must match
        assert tuple(path) == oracle_path, (trial, labels)


def test_path_collapses_to_labels():
    rng = np.random.default_rng(7)
    labels = [5, 5, 9, 4, 12]
    log_probs = np.log(rng.dirichlet(np.ones(16), size=20))
    path, _ = ctc_forced_align(log_probs, labels, blank_id=0)
    collapsed, prev = [], None
    for s in path:
        if s != 0 and s != prev:
            collapsed.append(int(s))
        prev = s
    assert collapsed == labels


def test_long_transcript_wide_trellis():
    """Transcripts with >63 labels make the state index exceed int8 range —
    the backtrack must keep indices as Python ints (regression: the int8
    backpointer dtype once leaked into the state variable)."""
    rng = np.random.default_rng(11)
    labels = [int(x) for x in rng.integers(1, 30, size=100)]
    t_len = 400
    log_probs = np.log(rng.dirichlet(np.ones(30), size=t_len))
    path, score = ctc_forced_align(log_probs, labels, blank_id=0)
    collapsed, prev = [], None
    for s in path:
        if s != 0 and s != prev:
            collapsed.append(int(s))
        prev = s
    assert collapsed == labels
    assert np.isfinite(score)


def test_empty_labels_all_blank():
    log_probs = np.log(np.full((5, 3), 1 / 3))
    path, score = ctc_forced_align(log_probs, [], blank_id=0)
    assert list(path) == [0] * 5
    assert score == pytest.approx(float(log_probs[:, 0].sum()))


def test_validation_errors():
    log_probs = np.log(np.full((3, 4), 0.25))
    with pytest.raises(ValueError, match="blank"):
        ctc_forced_align(log_probs, [1, 0, 2], blank_id=0)
    with pytest.raises(ValueError, match="range"):
        ctc_forced_align(log_probs, [9], blank_id=0)
    # 4 labels > 3 frames
    with pytest.raises(ValueError, match="frames"):
        ctc_forced_align(log_probs, [1, 2, 3, 1], blank_id=0)
    # [1, 1, 2] needs a blank between the repeat: 4 frames minimum
    with pytest.raises(ValueError, match="frames"):
        ctc_forced_align(log_probs, [1, 1, 2], blank_id=0)


def test_peaked_distribution_recovers_known_path():
    """A distribution sharply peaked on one valid path must be aligned to
    exactly that path, and the word segments must time it exactly."""
    # "ET A": E E <pad> T | | A  (ids 5 5 0 6 4 4 7)
    truth = [5, 5, 0, 6, 4, 4, 7]
    vocab = 8
    probs = np.full((len(truth), vocab), 0.01 / (vocab - 1))
    for t, s in enumerate(truth):
        probs[t] = (1 - 0.99) / (vocab - 1)
        probs[t, s] = 0.99
    labels = [5, 6, 4, 7]  # E T | A
    path, _ = ctc_forced_align(np.log(probs), labels, blank_id=0)
    assert list(path) == truth
    text, words = ctc_word_segments(
        path,
        frame_probs=probs[np.arange(len(path)), path],
        pad_id=0,
        delimiter_id=TOKENIZER.delimiter_id,
        id_to_token=TOKENIZER.id_to_token_mapping,
        frame_seconds=0.02,
    )
    assert text == "ET A"
    assert [(w["word"], w["start_frame"], w["end_frame"]) for w in words] == [
        ("ET", 0, 4), ("A", 6, 7),
    ]
    assert all(w["confidence"] == pytest.approx(0.99, abs=1e-6) for w in words)


@pytest.fixture(scope="module")
def tiny():
    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    return config, params


@pytest.fixture(scope="module")
def tiny_robust():
    from gsoc_wav2vec2_tpu import RobustWav2Vec2Config

    config = RobustWav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(1), config)
    return config, params


def test_align_segments_times_given_transcript(tiny):
    config, params = tiny
    ev = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(8000).astype(np.float32)
    text, words = ev.align_segments(audio, "hello,  world!")
    assert text == "HELLO WORLD"  # tokenizer normalisation applied
    assert [w["word"] for w in words] == ["HELLO", "WORLD"]
    total_frames = int(config.conv_output_length(8000))
    prev_end = 0
    for w in words:
        assert prev_end <= w["start_frame"] < w["end_frame"] <= total_frames
        prev_end = w["end_frame"]
        assert 0.0 < w["confidence"] <= 1.0
        assert w["start"] == pytest.approx(w["start_frame"] * ev.frame_seconds)
    # too much text for the frames available fails loudly
    with pytest.raises(ValueError, match="frames"):
        ev.align_segments(audio[:200], "THE QUICK BROWN FOX " * 10)


def test_align_segments_long_form_matches_unchunked(tiny):
    """Chunked alignment runs on the same global frame grid: with the
    window covering the whole utterance it must equal the unchunked path,
    and with real chunking the word count and global frame bounds hold."""
    config, params = tiny
    ev = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    rng = np.random.default_rng(4)
    audio = rng.standard_normal(24000).astype(np.float32)
    transcript = "SHE HAD YOUR DARK SUIT IN GREASY WASH WATER ALL YEAR"
    whole = ev.align_segments(audio, transcript, chunk_samples=24000)
    assert whole[0] == transcript
    text, words = ev.align_segments(
        audio, transcript, chunk_samples=8000, context_samples=1000
    )
    assert text == transcript
    assert [w["word"] for w in words] == transcript.split()
    total_frames = int(config.conv_output_length(24000))
    first_window = int(config.conv_output_length(8000))
    assert max(w["end_frame"] for w in words) <= total_frames
    assert max(w["end_frame"] for w in words) > first_window
    prev_end = 0
    for w in words:
        assert prev_end <= w["start_frame"] < w["end_frame"]
        prev_end = w["end_frame"]


def test_align_segments_pad_to_is_invisible_with_mask(tiny_robust):
    """`pad_to` (the serving bucket-shape reuse knob) pads the device
    window and slices the padding frames before the trellis.  For a
    mask-aware (robust) model the attention mask + per-frame LayerNorm
    make the padding fully invisible — results must be identical.  (The
    base family's time-axis GroupNorm sees padding, the same sensitivity
    as the reference's fixed-pad eval, so only structure is guaranteed
    there.)"""
    config, params = tiny_robust
    ev = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    rng = np.random.default_rng(6)
    audio = rng.standard_normal(5000).astype(np.float32)
    plain = ev.align_segments(audio, "HELLO WORLD")
    padded = ev.align_segments(audio, "HELLO WORLD", pad_to=8000)
    assert padded == plain


@pytest.mark.slow
def test_align_cli(tmp_path):
    """`cli.align` with --transcript and with a sibling TIMIT-style .TXT;
    an over-long transcript exits nonzero with a JSON error line."""
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
    (tmp_path / "clip.TXT").write_text("0 12000 she had your dark suit\n")

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.align",
             "--model_dir", model_dir, *extra],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=600,
        )

    result = run(str(clip), "--transcript", "HELLO WORLD")
    assert result.returncode == 0, result.stderr[-2000:]
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert report["transcription"] == "HELLO WORLD"
    assert [w["word"] for w in report["words"]] == ["HELLO", "WORLD"]
    assert all(
        set(w) >= {"word", "start", "end", "confidence"}
        for w in report["words"]
    )

    # sibling .TXT with TIMIT sample offsets stripped
    result = run(str(clip))
    assert result.returncode == 0, result.stderr[-2000:]
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert report["transcription"] == "SHE HAD YOUR DARK SUIT"

    # infeasible transcript (more labels than frames): JSON error line +
    # nonzero exit
    result = run(str(clip), "--transcript", "THE QUICK BROWN FOX " * 100)
    assert result.returncode == 1
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert "frames" in report["error"]

    # --transcript with two files is a usage error
    result = run(str(clip), str(clip), "--transcript", "HI")
    assert result.returncode == 2

    # per-file error contract in one batch: a wrong-rate file and a file
    # with no sibling transcript each emit a JSON error line, the batch
    # continues, exit code is 1
    badrate = tmp_path / "badrate.wav"
    with wave.open(str(badrate), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm[:4000].tobytes())
    (tmp_path / "badrate.txt").write_text("HELLO\n")
    orphan = tmp_path / "orphan.wav"
    orphan.write_bytes(clip.read_bytes())
    result = run(str(badrate), str(orphan))
    assert result.returncode == 1
    lines = [json.loads(l) for l in result.stdout.strip().splitlines()
             if l.startswith("{")]
    errors = {os.path.basename(r["file"]): r["error"] for r in lines}
    assert "sample rate 8000" in errors["badrate.wav"]
    assert "no transcript" in errors["orphan.wav"]
