"""Checkpoint averaging (`training.checkpoint.average_checkpoint_params`,
`cli.average`): tail-averaged params from Orbax training checkpoints into
a servable `save_pretrained` dir.  The reference retains per-epoch weight
files (`/root/reference/src/training_utils.py:38-45`) but ships no way to
combine them."""

import os
import subprocess
import sys

import jax
import numpy as np
import optax
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config, Wav2Vec2ForCTC
from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
from gsoc_wav2vec2_tpu.training.checkpoint import (
    CheckpointManager,
    average_checkpoint_params,
)
from gsoc_wav2vec2_tpu.training.state import TrainState

TINY = dict(
    hidden_size=32, num_heads=2, num_layers=2, intermediate_size=64,
    filter_sizes=[16, 16], kernal_sizes=[10, 3], strides=[5, 2],
)


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    """Three checkpoints whose params are p, 2p, 4p (so means are exact)."""
    tmp = tmp_path_factory.mktemp("avg")
    config = Wav2Vec2Config(**TINY)
    base = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    opt = optax.adam(1e-3)
    ckpt_dir = str(tmp / "ckpts")
    mgr = CheckpointManager(ckpt_dir)
    for step, scale in ((10, 1.0), (20, 2.0), (30, 4.0)):
        params = jax.tree.map(lambda x: x * scale, base)
        mgr.save(
            step,
            TrainState(
                step=jax.numpy.asarray(step), params=params,
                opt_state=opt.init(params),
            ),
            wait=True,
        )
    mgr.close()
    return config, base, ckpt_dir


def _assert_scaled(mean_params, base, scale):
    flat_m, _ = jax.tree.flatten(mean_params)
    flat_b, _ = jax.tree.flatten(base)
    assert len(flat_m) == len(flat_b)
    for m, b in zip(flat_m, flat_b):
        np.testing.assert_allclose(
            np.asarray(m), scale * np.asarray(b), rtol=1e-6
        )
        assert np.asarray(m).dtype == np.asarray(b).dtype


def test_average_all_and_last_n(ckpts):
    config, base, ckpt_dir = ckpts
    mean, used = average_checkpoint_params(ckpt_dir)
    assert used == [10, 20, 30]
    _assert_scaled(mean, base, (1 + 2 + 4) / 3)
    mean, used = average_checkpoint_params(ckpt_dir, last_n=2)
    assert used == [20, 30]
    _assert_scaled(mean, base, 3.0)


def test_average_explicit_steps_and_errors(ckpts, tmp_path):
    config, base, ckpt_dir = ckpts
    mean, used = average_checkpoint_params(ckpt_dir, steps=[10, 30])
    assert used == [10, 30]
    _assert_scaled(mean, base, 2.5)
    with pytest.raises(ValueError, match="not in checkpoint dir"):
        average_checkpoint_params(ckpt_dir, steps=[10, 99])
    with pytest.raises(ValueError, match="positive"):
        average_checkpoint_params(ckpt_dir, last_n=0)
    with pytest.raises(FileNotFoundError):
        average_checkpoint_params(str(tmp_path / "empty"))


def test_average_cli_end_to_end(ckpts, tmp_path):
    """`cli.average` subprocess writes a dir every decode surface loads."""
    config, base, ckpt_dir = ckpts
    config_dir = str(tmp_path / "cfg")
    Wav2Vec2ForCTC(config, seed=0).save_pretrained(config_dir)
    out_dir = str(tmp_path / "averaged")

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.average",
            "--ckpt_dir", ckpt_dir, "--config", config_dir,
            "--last_n", "2", "--out", out_dir,
        ],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "steps [20, 30]" in result.stdout

    model = Wav2Vec2ForCTC.from_pretrained(out_dir)
    _assert_scaled(model.params, base, 3.0)
    logits = model(np.zeros((1, 4000), np.float32))
    assert np.all(np.isfinite(np.asarray(logits)))
