"""StableHLO export round-trip tests (the SavedModel/ONNX-analog path,
reference `src/export2hub.py` / `notebooks/wav2vec2_onnx.ipynb`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.utils import tiny_config

from gsoc_wav2vec2_tpu.export.stablehlo import export_model, load_exported
from gsoc_wav2vec2_tpu.models.modeling import (
    init_wav2vec2_for_ctc_params,
    wav2vec2_for_ctc_forward,
)

SEQLEN = 8000


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_export_fixed_batch_roundtrip(tmp_path, model):
    cfg, params = model
    save_dir = str(tmp_path / "artifact")
    export_model(cfg, params, save_dir, seqlen=SEQLEN, batch_size=2,
                 compute_dtype=jnp.float32)

    exported, meta = load_exported(save_dir)
    assert meta["seqlen"] == SEQLEN and meta["with_lm_head"]

    speech = np.random.RandomState(0).randn(2, SEQLEN).astype(np.float32)
    got = np.asarray(exported.call(params, jnp.asarray(speech)))
    want = np.asarray(
        wav2vec2_for_ctc_forward(params, cfg, jnp.asarray(speech),
                                 training=False, compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_symbolic_batch(tmp_path, model):
    """batch_size=None exports a symbolic batch dim — any batch at runtime
    (strictly more than the reference's fixed-shape SavedModel)."""
    cfg, params = model
    save_dir = str(tmp_path / "artifact_sym")
    export_model(cfg, params, save_dir, seqlen=SEQLEN, batch_size=None,
                 compute_dtype=jnp.float32)
    exported, _ = load_exported(save_dir)
    for b in (1, 3):
        speech = np.random.RandomState(b).randn(b, SEQLEN).astype(np.float32)
        out = np.asarray(exported.call(params, jnp.asarray(speech)))
        assert out.shape[0] == b and out.shape[-1] == cfg.vocab_size


def test_export_robust_takes_mask(tmp_path):
    cfg = tiny_config(robust=True)
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), cfg)
    save_dir = str(tmp_path / "robust")
    export_model(cfg, params, save_dir, seqlen=SEQLEN, batch_size=1,
                 compute_dtype=jnp.float32)
    exported, meta = load_exported(save_dir)
    assert meta["with_attention_mask"]
    speech = np.zeros((1, SEQLEN), np.float32)
    mask = np.ones((1, SEQLEN), np.float32)
    out = np.asarray(exported.call(params, jnp.asarray(speech), jnp.asarray(mask)))
    assert out.shape == (1, cfg.conv_output_length(SEQLEN), cfg.vocab_size)


def test_exported_artifact_runs_without_model_code(tmp_path, model):
    """The serialized artifact must execute from the blob alone (the serving
    contract): deserialize in-process and call without touching modeling."""
    cfg, params = model
    save_dir = str(tmp_path / "standalone")
    export_model(cfg, params, save_dir, seqlen=SEQLEN, batch_size=1,
                 compute_dtype=jnp.float32)
    from jax import export as jax_export

    with open(f"{save_dir}/model.stablehlo", "rb") as f:
        exported = jax_export.deserialize(f.read())
    out = exported.call(params, jnp.zeros((1, SEQLEN), jnp.float32))
    assert np.asarray(out).shape[0] == 1


def test_saved_model_export_roundtrip(tmp_path):
    """TF SavedModel export (the literal export2hub analog): load with
    plain TensorFlow — no model code — and match the live JAX forward
    (mirrors the reference's TFhubTester, `tests/test_wav2vec2.py:285-326`)."""
    pytest.importorskip("tensorflow")
    import tensorflow as tf

    from gsoc_wav2vec2_tpu.export.savedmodel import export_saved_model
    from gsoc_wav2vec2_tpu.models.config import Wav2Vec2Config

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
    )
    from gsoc_wav2vec2_tpu.models.modeling import (
        init_wav2vec2_for_ctc_params,
        wav2vec2_for_ctc_forward,
    )

    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    seqlen = 16000
    d = str(tmp_path / "sm")
    export_saved_model(
        config, params, d, seqlen=seqlen, platforms=("cpu",)
    )

    speech = np.random.RandomState(0).randn(2, seqlen).astype(np.float32)
    want = np.asarray(
        wav2vec2_for_ctc_forward(
            params, config, jnp.asarray(speech), training=False
        ),
        np.float32,
    )
    loaded = tf.saved_model.load(d)
    got = loaded(tf.constant(speech)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)
