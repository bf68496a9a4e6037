"""CTC prefix beam search (`decoding.py`) — the decode upgrade over the
reference's greedy-only path, validated against an exact brute-force
oracle that enumerates every alignment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config
from gsoc_wav2vec2_tpu.decoding import (
    brute_force_ctc_best,
    ctc_prefix_beam_search,
)
from gsoc_wav2vec2_tpu.evaluation import GreedyCTCEvaluator
from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params


def _rand_logprobs(t, v, seed, sharp=1.0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((t, v)) * sharp
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def test_beam_search_matches_brute_force_oracle():
    """With a wide beam, prefix beam search must find the exact
    max-alignment-mass label sequence (oracle: enumerate all V^T paths,
    collapse, sum)."""
    for seed in range(8):
        lp = _rand_logprobs(t=5, v=4, seed=seed)
        want, _ = brute_force_ctc_best(lp)
        got = ctc_prefix_beam_search(lp, beam_width=64)
        assert got == want, (seed, got, want)


def test_beam_search_beats_greedy_on_split_mass():
    """The classic case: P(blank)=0.6 per frame makes greedy emit nothing,
    but the summed mass of 'A' alignments (0.64) wins."""
    p = np.log(np.asarray([[0.6, 0.4], [0.6, 0.4]]))
    greedy = list(np.argmax(p, axis=-1))
    assert greedy == [0, 0]  # greedy: all blanks -> empty
    assert ctc_prefix_beam_search(p, beam_width=4) == [1]


def test_beam_width_one_equals_sharp_greedy():
    """On a sharply-peaked distribution every decode agrees."""
    lp = _rand_logprobs(t=12, v=6, seed=3, sharp=20.0)
    greedy_path = np.argmax(lp, axis=-1)
    collapsed = []
    prev = None
    for s in greedy_path:
        if s != 0 and s != prev:
            collapsed.append(int(s))
        prev = s
    assert ctc_prefix_beam_search(lp, beam_width=8) == collapsed


def test_vectorized_matches_dict_engine():
    """The numpy-vectorized engine (the lm=None fast path) must produce
    the SAME decode as the per-frame dict engine for many random inputs,
    beam widths and pruning settings — including long sequences where
    merging/ranking differences would compound."""
    from gsoc_wav2vec2_tpu.decoding import CharNGramLM

    # lm with zero weight forces the dict engine while leaving scores
    # untouched (fusion adds lm_weight * logp == 0)
    null_lm = CharNGramLM(order=1, vocab_size=8)
    for seed in range(10):
        for t, v, bw, topk in [
            (20, 6, 4, 0), (50, 8, 16, 0), (120, 8, 8, 4), (768, 8, 25, 0),
        ]:
            lp = _rand_logprobs(t, v if v <= 8 else 8, seed)
            fast = ctc_prefix_beam_search(lp, bw, top_k_tokens=topk)
            slow = ctc_prefix_beam_search(
                lp, bw, top_k_tokens=topk, lm=null_lm, lm_weight=0.0
            )
            assert fast == slow, (seed, t, v, bw, topk, fast, slow)


def test_char_ngram_lm_is_normalized_and_learns():
    """Witten-Bell probabilities sum to 1 over the vocab for any context,
    and training text shifts mass onto seen continuations."""
    from gsoc_wav2vec2_tpu.decoding import CharNGramLM

    lm = CharNGramLM(order=3, vocab_size=8).fit(
        [[5, 6, 7, 5, 6], [5, 6, 7], [5, 6]]
    )
    for ctx in [(), (5,), (5, 6), (6, 7), (3, 3)]:
        total = sum(np.exp(lm.logp(ctx, s)) for s in range(8))
        np.testing.assert_allclose(total, 1.0, rtol=1e-9)
    # after "5 6", "7" dominates (seen twice out of three continuations)
    assert lm.logp((5, 6), 7) > lm.logp((5, 6), 4)
    # unseen contexts back off, never -inf
    assert np.isfinite(lm.logp((3, 3), 1))


def test_lm_save_load_roundtrip(tmp_path):
    from gsoc_wav2vec2_tpu.decoding import CharNGramLM

    lm = CharNGramLM(order=2, vocab_size=6).fit([[1, 2, 3], [1, 2]])
    path = str(tmp_path / "lm.json")
    lm.save(path)
    lm2 = CharNGramLM.load(path)
    for ctx in [(), (1,), (2,), (5,)]:
        for s in range(6):
            np.testing.assert_allclose(lm2.logp(ctx, s), lm.logp(ctx, s))


def test_shallow_fusion_recovers_ambiguous_token():
    """Acoustics split evenly between two continuations; the LM (trained on
    text that always continues one way) must break the tie — and with
    fusion off, the decoder must NOT prefer it."""
    from gsoc_wav2vec2_tpu.decoding import CharNGramLM

    # vocab: 0=blank, 1='A', 2='B', 3='C'.  LM: "A B" always (never "A C").
    lm = CharNGramLM(order=2, vocab_size=4).fit([[1, 2]] * 20)
    # frames: certain 'A', then a 50/50 B-vs-C frame (tiny tilt toward C so
    # the acoustics-only decode picks C)
    p = np.log(np.asarray([
        [0.01, 0.97, 0.01, 0.01],
        [0.02, 0.02, 0.47, 0.49],
    ]))
    plain = ctc_prefix_beam_search(p, beam_width=8)
    assert plain == [1, 3]
    fused = ctc_prefix_beam_search(
        p, beam_width=8, lm=lm, lm_weight=0.5, token_bonus=0.0
    )
    assert fused == [1, 2]


def test_fit_from_librispeech_layout(tmp_path):
    from gsoc_wav2vec2_tpu.decoding import CharNGramLM

    chap = tmp_path / "7" / "9"
    chap.mkdir(parents=True)
    (chap / "7-9.trans.txt").write_text(
        "7-9-0000 HELLO WORLD\n7-9-0001 HELLO AGAIN"
    )
    lm = CharNGramLM.fit_from_librispeech(str(tmp_path), order=3)
    # H(11) E(5) L(15) L(15) O(8): after "L L" the corpus always sees "O"
    assert lm.logp((15, 15), 8) > lm.logp((15, 15), 5)


@pytest.mark.slow
def test_evaluate_cli_beam_with_lm(tmp_path):
    """`cli.evaluate --beam_width --lm_fit_dir` end-to-end: fits the LM on
    the corpus transcripts, decodes with fusion, saves the LM JSON."""
    import json
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac

    from gsoc_wav2vec2_tpu import Wav2Vec2Config, Wav2Vec2ForCTC

    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=1, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    model_dir = str(tmp_path / "model")
    Wav2Vec2ForCTC(config, seed=0).save_pretrained(model_dir)

    chap = tmp_path / "1" / "1"
    chap.mkdir(parents=True)
    rng = np.random.default_rng(5)
    lines = []
    for i in range(2):
        n = 1600
        sig = np.clip(
            1500 * np.sin(np.arange(n) / (3.0 + i)), -32768, 32767
        ).astype(np.int64)
        (chap / f"1-1-{i:04d}.flac").write_bytes(
            encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7)
        )
        lines.append(f"1-1-{i:04d} HELLO WORLD")
    (chap / "1-1.trans.txt").write_text("\n".join(lines))

    lm_path = str(tmp_path / "lm.json")
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.evaluate",
            "--model_dir", model_dir, "--data_dir", str(tmp_path),
            "--mode", "padded", "--pad_to", "1600", "--batch_size", "2",
            "--beam_width", "4", "--lm_fit_dir", str(tmp_path),
            "--lm_path", lm_path, "--lm_weight", "0.3",
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    report = json.loads(result.stdout.strip().splitlines()[-1])
    assert report["beam_width"] == 4
    assert report["lm"]["weight"] == 0.3
    assert 0.0 <= report["wer"] <= 1.0
    # the fitted LM was persisted and round-trips
    from gsoc_wav2vec2_tpu.decoding import CharNGramLM

    lm = CharNGramLM.load(lm_path)
    assert np.isfinite(lm.logp((11, 5), 15))  # "HE" -> "L"


def test_evaluator_beam_width_end_to_end():
    """`GreedyCTCEvaluator(beam_width=...)` produces strings and agrees
    with greedy on a peaked (deterministic-ish) model output; batch API
    + frame-length truncation both exercised."""
    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    speech = np.asarray(
        np.random.default_rng(0).standard_normal((2, 1600)), np.float32
    )
    lengths = np.asarray([1600, 1200])

    greedy = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    beam = GreedyCTCEvaluator(
        config, params, compute_dtype=jnp.float32, beam_width=12
    )
    hg = greedy.predict_batch(speech, lengths)
    hb = beam.predict_batch(speech, lengths)
    assert len(hg) == len(hb) == 2
    assert all(isinstance(s, str) for s in hb)
    # random-weight outputs are near-uniform, so strings may differ; a
    # width-1 beam IS greedy-by-path up to mass ties — just assert the
    # beam decode is deterministic
    assert hb == beam.predict_batch(speech, lengths)


def test_fusion_knobs_without_lm_are_rejected():
    """--lm_weight/--token_bonus only act inside the LM-fusion decode; both
    CLIs must refuse them without an LM instead of silently ignoring them
    (the no-LM vectorized engine never applies a bonus)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.transcribe",
            "--model_dir", "unused", "--beam_width", "4",
            "--token_bonus", "1.0", "nofile.wav",
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert result.returncode == 2, (result.returncode, result.stderr[-500:])
    assert "only act with --lm_path" in result.stderr
