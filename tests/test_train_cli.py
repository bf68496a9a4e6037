"""End-to-end training-CLI test: tiny model, synthetic LibriSpeech corpus,
two stages, checkpoints, metrics JSONL, final save_pretrained — the whole
`main.py`-equivalent path (reference §3.1 call stack) on an 8-device CPU
mesh via subprocess.
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

# slow tier: every test spawns fresh CLI subprocesses (fresh compiles)
pytestmark = pytest.mark.slow

from flac_encoder import encode_flac
from gsoc_wav2vec2_tpu import Wav2Vec2Config, Wav2Vec2ForCTC

TEXTS = ["HELLO WORLD", "TINY MODEL", "TPU TRAINING", "FOUR SAMPLES"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("corpus")
    chap = root / "1" / "1"
    chap.mkdir(parents=True)
    lines = []
    for i, text in enumerate(TEXTS):
        sig = np.clip(
            2000 * np.sin(np.arange(6000) / 6.0) + rng.integers(-50, 50, 6000),
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
    )
    model = Wav2Vec2ForCTC(config, seed=0)
    d = str(tmp_path_factory.mktemp("tiny_model"))
    model.save_pretrained(d)
    return d


def _cli_env():
    env = dict(os.environ, PYTHONPATH="/root/repo",
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # bypass the TPU-plugin sitecustomize
    return env


def _run_train(args, env, timeout=900):
    return subprocess.run(
        [sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.train", *args],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=timeout,
    )


def test_train_cli_end_to_end(corpus, tiny_model_dir, tmp_path):
    env = _cli_env()
    ckpt_dir = str(tmp_path / "ckpts")
    log_dir = str(tmp_path / "logs")
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.train",
            "--model_id", tiny_model_dir,
            "--train_dir", corpus,
            "--test_dir", corpus,
            "--stage1_epochs", "1",
            "--stage2_epochs", "1",
            # global batch = 1 * (8/4) = 2, x2 accumulation = 4 samples per
            # optimizer update: drives the microbatch accumulate/apply path
            # through the full driver alongside tensor parallelism
            "--batch_size_per_device", "1",
            "--grad_accum", "2",
            "--audio_maxlen", "6000",
            "--labels_maxlen", "32",
            "--logging_steps", "1",
            "--compute_dtype", "float32",
            "--model_axis", "4",
            "--ckpt_dir", ckpt_dir,
            "--log_dir", log_dir,
            # capture one profiled update (the reference has no profiler;
            # SURVEY §5) — also proves tracing survives the accum path
            "--profile_steps", "1",
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "test loss:" in result.stdout

    # the profiler wrote a TensorBoard/Perfetto trace
    trace_root = os.path.join(log_dir, "trace")
    assert "profiler trace written" in result.stdout
    trace_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(trace_root) for f in fs
    ]
    assert any(f.endswith(".xplane.pb") for f in trace_files), trace_files

    # metrics JSONL written with both stages
    metrics = [json.loads(l) for l in open(os.path.join(log_dir, "metrics.jsonl"))]
    keys = {k for m in metrics for k in m}
    assert "stage1/loss" in keys and "stage2/loss" in keys and "test_loss" in keys
    losses = [m["stage1/loss"] for m in metrics if "stage1/loss" in m]
    assert all(np.isfinite(l) for l in losses)

    # per-stage orbax checkpoints exist
    run_dirs = os.listdir(ckpt_dir)
    assert len(run_dirs) == 1
    stages = sorted(os.listdir(os.path.join(ckpt_dir, run_dirs[0])))
    assert "stage1" in stages and "stage2" in stages and "final" in stages

    # the saved final model loads back through the public API
    final = os.path.join(ckpt_dir, run_dirs[0], "final")
    reloaded = Wav2Vec2ForCTC.from_pretrained(final)
    out = reloaded(np.zeros((1, 6000), np.float32))
    assert out.shape[0] == 1 and out.shape[2] == reloaded.config.vocab_size


def test_train_cli_resume_bit_exact(corpus, tiny_model_dir, tmp_path):
    """Preemption recovery: 1 epoch + `--resume` to 2 must equal a straight
    2-epoch run bit-for-bit (Orbax restores step, params, and Adam moments;
    the per-epoch data order and fold_in(step) RNG are both deterministic)."""
    env = _cli_env()

    def run(tag, extra):
        ckpt_dir = str(tmp_path / f"ckpts_{tag}")
        r = _run_train(
            [
                "--model_id", tiny_model_dir,
                "--train_dir", corpus,
                "--stage1_epochs", "2",
                "--stage2_epochs", "1",
                "--transition_epoch", "0",  # lr2 from stage-2 epoch 1 onward
                "--batch_size_per_device", "1",
                "--model_axis", "2",  # global batch = 4 = corpus size
                "--audio_maxlen", "6000",
                "--labels_maxlen", "32",
                "--compute_dtype", "float32",
                "--ckpt_dir", ckpt_dir,
                "--log_dir", str(tmp_path / f"logs_{tag}"),
                *extra,
            ],
            env,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        runs = os.listdir(ckpt_dir)
        assert len(runs) == 1
        return r, os.path.join(ckpt_dir, runs[0])

    _, straight_dir = run("straight", [])

    # "preempted" run: stage 1 stops after epoch 1 (no final save matters)
    _, resumed_dir = run("resumed", ["--stage1_epochs", "1", "--stage2_epochs", "0"])
    # continue it to the full recipe
    r2 = _run_train(
        [
            "--model_id", tiny_model_dir,
            "--train_dir", corpus,
            "--stage1_epochs", "2",
            "--stage2_epochs", "1",
            "--transition_epoch", "0",
            "--batch_size_per_device", "1",
            "--model_axis", "2",
            "--audio_maxlen", "6000",
            "--labels_maxlen", "32",
            "--compute_dtype", "float32",
            "--log_dir", str(tmp_path / "logs_resumed2"),
            "--resume", resumed_dir,
        ],
        env,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "stage 1: resumed epoch 1" in r2.stdout, r2.stdout[-2000:]

    a = Wav2Vec2ForCTC.from_pretrained(os.path.join(straight_dir, "final"))
    b = Wav2Vec2ForCTC.from_pretrained(os.path.join(resumed_dir, "final"))
    flat_a = jax.tree_util.tree_leaves_with_path(a.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b.params))
    assert flat_a and len(flat_a) == len(flat_b)
    for path, leaf_a in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf_a), np.asarray(flat_b[path]), err_msg=str(path)
        )


def test_train_cli_sigterm_preemption_bit_exact(corpus, tiny_model_dir, tmp_path):
    """SIGTERM (the TPU-preemption signal) mid-epoch: the driver must save a
    step-granular checkpoint, exit cleanly, and `--resume` must fast-forward
    the seeded batch stream so the completed run equals an uninterrupted one
    bit-for-bit — the reference loses everything since its last epoch
    boundary (`training_utils.py:38-45`)."""
    import signal as _signal
    import time as _time

    env = _cli_env()
    common = [
        "--model_id", tiny_model_dir,
        "--train_dir", corpus,
        "--stage1_epochs", "8",
        "--stage2_epochs", "0",
        "--batch_size_per_device", "1",
        "--model_axis", "4",  # global batch 2 -> 2 updates per epoch
        "--audio_maxlen", "6000",
        "--labels_maxlen", "32",
        "--logging_steps", "1",
        "--compute_dtype", "float32",
    ]

    r = _run_train(
        common + ["--ckpt_dir", str(tmp_path / "ckpts_straight"),
                  "--log_dir", str(tmp_path / "logs_straight")],
        env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    straight_dir = os.path.join(
        str(tmp_path / "ckpts_straight"),
        os.listdir(str(tmp_path / "ckpts_straight"))[0],
    )

    # preempted run: SIGTERM once training demonstrably started
    ckpt_dir = str(tmp_path / "ckpts_preempt")
    log_dir = str(tmp_path / "logs_preempt")
    out_path = str(tmp_path / "preempt_stdout.txt")
    with open(out_path, "w") as out:
        proc = subprocess.Popen(
            [sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.train", *common,
             "--ckpt_dir", ckpt_dir, "--log_dir", log_dir],
            stdout=out, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        metrics_path = os.path.join(log_dir, "metrics.jsonl")
        deadline = _time.time() + 600
        seen_losses = 0
        while _time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    "training finished before the signal: "
                    + open(out_path).read()[-3000:]
                )
            if os.path.exists(metrics_path):
                with open(metrics_path) as f:
                    seen_losses = sum(
                        1 for line in f if "stage1/loss" in line
                    )
                if seen_losses >= 2:
                    break
            _time.sleep(0.2)
        assert seen_losses >= 2, "training never produced loss logs"
        proc.send_signal(_signal.SIGTERM)
        proc.wait(timeout=300)
    stdout = open(out_path).read()
    assert proc.returncode == 0, stdout[-3000:]
    assert "preempted — saved epoch" in stdout, stdout[-3000:]

    run_dir = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
    r2 = _run_train(
        common + ["--log_dir", str(tmp_path / "logs_preempt2"),
                  "--resume", run_dir],
        env,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "resumed epoch" in r2.stdout

    a = Wav2Vec2ForCTC.from_pretrained(os.path.join(straight_dir, "final"))
    b = Wav2Vec2ForCTC.from_pretrained(os.path.join(run_dir, "final"))
    flat_a = jax.tree_util.tree_leaves_with_path(a.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b.params))
    assert flat_a and len(flat_a) == len(flat_b)
    for path, leaf_a in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf_a), np.asarray(flat_b[path]), err_msg=str(path)
        )


def test_train_cli_refuses_zero_update_epochs(corpus, tiny_model_dir, tmp_path):
    """An epoch whose batches never complete one optimizer update (fewer
    batches than --grad_accum) must abort loudly — otherwise the driver
    'trains' for hours, checkpoints the untouched initial params, and
    exports an untrained model."""
    r = _run_train(
        [
            "--model_id", tiny_model_dir,
            "--train_dir", corpus,
            "--stage1_epochs", "1", "--stage2_epochs", "0",
            # global batch 4 = corpus size -> exactly 1 batch/epoch < accum 2
            "--batch_size_per_device", "1", "--model_axis", "2",
            "--grad_accum", "2",
            "--audio_maxlen", "6000", "--labels_maxlen", "32",
            "--compute_dtype", "float32",
            "--ckpt_dir", str(tmp_path / "ckpts"),
            "--log_dir", str(tmp_path / "logs"),
        ],
        _cli_env(),
    )
    assert r.returncode != 0
    assert "never completed an optimizer update" in r.stderr
