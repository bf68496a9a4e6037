"""Offline WER gate: the full two-stage training CLI must actually learn to
*transcribe*, not merely reduce the loss (VERDICT r1, top item).

A tiny model overfits a 4-utterance synthetic FLAC corpus through
`cli.train` (both stages, real loaders, checkpoints, Orbax), then
`cli.evaluate --mode single` — the reference's exact no-padding evaluation
mode — must return WER 0.0 on the training utterances.  This is the
strongest training-correctness claim available without network access
(BASELINE.md's 3.3%/5.6% WER anchors need real LibriSpeech + pretrained
weights); it exercises the same loss → gradient → optimizer → decode chain
end to end.  Mirrors the reference's end-to-end gate
(`/root/reference/tests/test_wav2vec2.py:109-170`) + training recipe
(`src/main.py:204-255`).

Recipe notes: regularisation is disabled in the tiny config (dropout 0, no
SpecAugment, survival 1.0) — the gate tests optimisation mechanics, and a
4-sample corpus cannot afford stochastic masking; stage-2 LR is raised to
5e-4 (the reference's 1e-4 is tuned for a pretrained backbone).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from flac_encoder import encode_flac
from gsoc_wav2vec2_tpu import Wav2Vec2Config, Wav2Vec2ForCTC

# slow tier: full two-stage CLI overfit to WER 0 (minutes)
pytestmark = pytest.mark.slow

TEXTS = ["HELLO WORLD", "TINY MODEL", "TPU TRAINING", "FOUR SAMPLES"]
AUDIO_LEN = 4000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Four distinct utterances: per-sample carrier frequency + noise gives
    the conv front-end something to separate."""
    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("wer_corpus")
    chap = root / "1" / "1"
    chap.mkdir(parents=True)
    lines = []
    for i, text in enumerate(TEXTS):
        sig = np.clip(
            2000 * np.sin(np.arange(AUDIO_LEN) / (3.0 + 2.0 * i))
            + rng.normal(0, 60, AUDIO_LEN),
            -32768, 32767,
        ).astype(np.int64)
        (chap / f"1-1-{i:04d}.flac").write_bytes(
            encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7)
        )
        lines.append(f"1-1-{i:04d} {text}")
    (chap / "1-1.trans.txt").write_text("\n".join(lines))
    return str(root)


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    config = Wav2Vec2Config(
        hidden_size=64,
        num_heads=4,
        num_layers=2,
        intermediate_size=128,
        filter_sizes=[32, 32],
        kernal_sizes=[10, 3],
        strides=[5, 2],
        dropout=0.0,
        apply_spec_augment=False,
        survival_prob=1.0,
    )
    model = Wav2Vec2ForCTC(config, seed=0)
    d = str(tmp_path_factory.mktemp("wer_tiny_model"))
    model.save_pretrained(d)
    return d


def _cli_env(devices: int = 1):
    env = dict(os.environ, PYTHONPATH="/root/repo",
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={devices}")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def test_two_stage_cli_reaches_wer_zero(corpus, tiny_model_dir, tmp_path):
    env = _cli_env()
    ckpt_dir = str(tmp_path / "ckpts")
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.train",
            "--model_id", tiny_model_dir,
            "--train_dir", corpus,
            "--stage1_epochs", "5",
            "--stage2_epochs", "300",
            "--stage2_lr1", "5e-4",
            "--stage2_lr2", "5e-4",
            "--batch_size_per_device", "4",  # global batch 4 = corpus size
            "--audio_maxlen", str(AUDIO_LEN),
            "--labels_maxlen", "32",
            "--logging_steps", "50",
            "--ckpt_every_epochs", "50",
            "--compute_dtype", "float32",
            "--ckpt_dir", ckpt_dir,
            "--log_dir", str(tmp_path / "logs"),
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=1800,
    )
    assert result.returncode == 0, result.stderr[-3000:]

    run_dirs = os.listdir(ckpt_dir)
    assert len(run_dirs) == 1
    final = os.path.join(ckpt_dir, run_dirs[0], "final")

    # the reference's exact no-padding eval mode over the training corpus
    eval_result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.evaluate",
            "--model_dir", final,
            "--data_dir", corpus,
            "--mode", "single",
            # exact lengths: the tiny overfit model (trained without an
            # attention mask at exactly AUDIO_LEN) is brittle to the padding
            # --round_to adds; real checkpoints tolerate ~0.1 s of padding
            "--round_to", "1",
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=900,
    )
    assert eval_result.returncode == 0, eval_result.stderr[-3000:]
    report = json.loads(eval_result.stdout.strip().splitlines()[-1])
    assert report["num_samples"] == len(TEXTS)
    assert report["wer"] == 0.0, (
        f"model did not learn to transcribe: {report} "
        f"(train stderr tail: {result.stderr[-500:]})"
    )

    # prefix beam search on the same trained model must also reach WER 0 —
    # the decode upgrade may never be WORSE than greedy on a confident model
    beam_result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.evaluate",
            "--model_dir", final, "--data_dir", corpus,
            "--mode", "single", "--round_to", "1", "--beam_width", "8",
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=900,
    )
    assert beam_result.returncode == 0, beam_result.stderr[-3000:]
    beam_report = json.loads(beam_result.stdout.strip().splitlines()[-1])
    assert beam_report["wer"] == 0.0, f"beam decode regressed: {beam_report}"
