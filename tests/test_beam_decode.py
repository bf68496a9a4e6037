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
