"""HuBERT model-family support (beyond the reference, which is wav2vec2-only).

HuBERT (Hsu et al., 2021) is architecturally wav2vec2 minus the pretraining
quantizer: same conv feature encoder, feature projection (with HF's
`feat_proj_layer_norm` knob), positional conv, and transformer encoder in
both post-norm (base) and stable-pre-norm (large) variants.  Checkpoints
like facebook/hubert-large-ls960-ft therefore convert onto this framework's
existing parameter tree via `convert.torch_to_jax` (the `hubert.` prefix)
and run through every surface (evaluator, serving, export) unchanged.

Oracle: random-weight `transformers.HubertForCTC`, mirroring
`tests/test_parity.py`'s HF-oracle structure (reference
`tests/test_wav2vec2.py:48-95`).
"""

import numpy as np
import pytest
from utils import requires_transformers, tiny_config

from gsoc_wav2vec2_tpu.data.processor import Wav2Vec2Processor


def hubert_hf_config(cfg, feat_proj_layer_norm=True):
    import transformers

    return transformers.HubertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=tuple(cfg.filter_sizes),
        conv_kernel=tuple(cfg.kernal_sizes),
        conv_stride=tuple(cfg.strides),
        conv_bias=cfg.conv_bias,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=cfg.attention_norm_type == "prenorm",
        feat_extract_norm=cfg.feature_extractor_norm_type,
        feat_proj_layer_norm=feat_proj_layer_norm,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
        mask_time_prob=0.05,  # keeps masked_spec_embed in the state dict
        hidden_act="gelu",
        layer_norm_eps=cfg.layer_norm_eps,
        pad_token_id=cfg.pad_id,
    )


def _convert_and_compare(ours_cfg, hf_cfg, atol=2e-4):
    import jax.numpy as jnp
    import torch
    import transformers

    from gsoc_wav2vec2_tpu.convert.torch_to_jax import params_from_hf_model
    from gsoc_wav2vec2_tpu.models.modeling import wav2vec2_for_ctc_forward

    torch.manual_seed(0)
    hf_model = transformers.HubertForCTC(hf_cfg).eval()
    params = params_from_hf_model(hf_model, ours_cfg)

    speech = np.random.RandomState(1).randn(2, 4000).astype(np.float32)
    with torch.no_grad():
        expected = hf_model(torch.from_numpy(speech)).logits.numpy()
    got = np.asarray(
        wav2vec2_for_ctc_forward(
            params, ours_cfg, jnp.asarray(speech), None,
            training=False, compute_dtype=jnp.float32,
        )
    )
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=atol)
    return got, expected


@requires_transformers
def test_hubert_base_family_parity():
    """Post-norm + group-norm conv stack (hubert-base geometry)."""
    cfg = tiny_config()
    got, expected = _convert_and_compare(cfg, hubert_hf_config(cfg))
    # end-to-end: greedy transcriptions agree too
    tok = Wav2Vec2Processor(is_tokenizer=True)
    for row_got, row_exp in zip(got.argmax(-1), expected.argmax(-1)):
        assert tok.decode(row_got) == tok.decode(row_exp)


@requires_transformers
def test_hubert_large_family_parity():
    """Stable-pre-norm + layer-norm convs + conv bias (hubert-large
    geometry, e.g. facebook/hubert-large-ls960-ft)."""
    cfg = tiny_config(robust=True)
    _convert_and_compare(cfg, hubert_hf_config(cfg))


@requires_transformers
def test_hubert_no_feat_proj_layer_norm():
    """HF `feat_proj_layer_norm=False` (distilhubert-style): the projection
    LayerNorm is absent from BOTH parameter trees and the forward skips it."""
    cfg = tiny_config(feat_proj_layer_norm=False)
    hf_cfg = hubert_hf_config(cfg, feat_proj_layer_norm=False)
    _convert_and_compare(cfg, hf_cfg)

    from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
    import jax

    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), cfg)
    assert "layer_norm" not in params["wav2vec2"]["feature_projection"]


@requires_transformers
def test_hubert_missing_masked_spec_embed_zero_filled():
    """HF omits `masked_spec_embed` when both mask probs are 0 — conversion
    must zero-fill it (inert outside SpecAugment) rather than KeyError."""
    import torch
    import transformers

    from gsoc_wav2vec2_tpu.convert.torch_to_jax import params_from_hf_model

    cfg = tiny_config()
    hf_cfg = hubert_hf_config(cfg)
    hf_cfg.mask_time_prob = 0.0
    hf_cfg.mask_feature_prob = 0.0
    torch.manual_seed(0)
    hf_model = transformers.HubertForCTC(hf_cfg).eval()
    assert not any("masked_spec_embed" in k for k in hf_model.state_dict())
    params = params_from_hf_model(hf_model, cfg)
    mse = np.asarray(params["wav2vec2"]["masked_spec_embed"])
    assert mse.shape == (cfg.hidden_size,) and not mse.any()


@requires_transformers
def test_convert_cli_handles_local_hubert_dir(tmp_path):
    """`cli.convert` auto-detects model_type=hubert, runs its built-in
    parity gate, and the output dir loads through the public API with the
    extension config field round-tripping."""
    import torch
    import transformers

    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC
    from gsoc_wav2vec2_tpu.cli.convert import convert

    cfg = tiny_config(feat_proj_layer_norm=False)
    hf_cfg = hubert_hf_config(cfg, feat_proj_layer_norm=False)
    torch.manual_seed(0)
    hf_model = transformers.HubertForCTC(hf_cfg).eval()
    hf_dir = str(tmp_path / "hf-hubert")
    hf_model.save_pretrained(hf_dir)

    out_dir = str(tmp_path / "jax-hubert")
    convert(hf_dir, out_dir, with_lm_head=True, verify=True)

    model = Wav2Vec2ForCTC.from_pretrained(out_dir)
    assert model.config.feat_proj_layer_norm is False
    speech = np.random.RandomState(2).randn(1, 4000).astype(np.float32)
    with torch.no_grad():
        expected = hf_model(torch.from_numpy(speech)).logits.numpy()
    got = np.asarray(model(speech))
    np.testing.assert_allclose(got, expected, atol=2e-4)


@requires_transformers
@pytest.mark.parametrize("family", ["wav2vec2", "hubert"])
def test_from_pretrained_reads_raw_hf_snapshot(tmp_path, family):
    """`from_pretrained` on a RAW HF snapshot directory (HF-schema
    config.json + torch weights, exactly what `snapshot_download` fetches
    for facebook/wav2vec2-base-960h or facebook/hubert-large-ls960-ft):
    the config translates via `config_from_hf_dict` and the weights load
    through the torch fallback — no separate converter run, which the
    reference always required (`convert_torch_to_tf.py`)."""
    import torch
    import transformers

    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC
    from utils import matching_hf_config

    cfg = tiny_config()
    if family == "hubert":
        hf_cfg = hubert_hf_config(cfg)
        hf_model = transformers.HubertForCTC(hf_cfg).eval()
    else:
        hf_cfg = matching_hf_config(cfg)
        hf_model = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    hf_dir = str(tmp_path / f"hf-{family}")
    hf_model.save_pretrained(hf_dir)

    model = Wav2Vec2ForCTC.from_pretrained(hf_dir)
    assert model.config.num_layers == cfg.num_layers
    assert model.config.kernal_sizes == list(hf_cfg.conv_kernel)
    speech = np.random.RandomState(3).randn(1, 4000).astype(np.float32)
    with torch.no_grad():
        expected = hf_model(torch.from_numpy(speech)).logits.numpy()
    np.testing.assert_allclose(np.asarray(model(speech)), expected, atol=2e-4)


def test_config_from_hf_dict_detection_and_errors():
    from gsoc_wav2vec2_tpu.models.config import (
        config_from_hf_dict,
        is_hf_config_dict,
    )

    assert is_hf_config_dict({"model_type": "wav2vec2"})
    assert is_hf_config_dict({"num_hidden_layers": 12})
    assert not is_hf_config_dict(tiny_config().to_dict())
    with pytest.raises(ValueError, match="model_type"):
        config_from_hf_dict({"model_type": "whisper"})
    # stable layer norm selects the robust family
    robust = config_from_hf_dict(
        {"model_type": "wav2vec2", "do_stable_layer_norm": True,
         "feat_extract_norm": "layer", "conv_bias": True}
    )
    assert robust.is_robust and robust.attention_norm_type == "prenorm"
    # SpecAugment knobs carry over on BOTH axes (mask_feature_* are this
    # framework's extension fields; HF robust recipes set them)
    cfg = config_from_hf_dict(
        {"model_type": "wav2vec2", "mask_time_prob": 0.08,
         "mask_feature_prob": 0.25, "mask_feature_length": 64}
    )
    assert cfg.mask_time_prob == 0.08
    assert cfg.mask_feature_prob == 0.25 and cfg.mask_feature_length == 64


def test_pretraining_rejects_no_feat_proj_layer_norm():
    """The quantizer consumes the normed conv features; the knob must fail
    at config time, not KeyError inside the traced pretraining forward."""
    from utils import tiny_pretraining_config

    with pytest.raises(ValueError, match="feat_proj_layer_norm"):
        tiny_pretraining_config(feat_proj_layer_norm=False)


@requires_transformers
def test_hf_snapshot_ignores_hf_layout_h5(tmp_path):
    """HF repos ship a tf_model.h5 in HF's Keras layout (not the
    reference's); an HF-schema snapshot must load the torch weights and
    never attempt that h5."""
    import torch
    import transformers

    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC

    cfg = tiny_config()
    hf_model = transformers.HubertForCTC(hubert_hf_config(cfg)).eval()
    hf_dir = tmp_path / "hf-snap"
    hf_model.save_pretrained(str(hf_dir))
    # a decoy h5 the loader must not touch (would raise if parsed)
    (hf_dir / "tf_model.h5").write_bytes(b"\x89HDF-not-really")

    model = Wav2Vec2ForCTC.from_pretrained(str(hf_dir))
    speech = np.random.RandomState(4).randn(1, 4000).astype(np.float32)
    with torch.no_grad():
        expected = hf_model(torch.from_numpy(speech)).logits.numpy()
    np.testing.assert_allclose(np.asarray(model(speech)), expected, atol=2e-4)


@requires_transformers
def test_hubert_runs_decode_surfaces(tmp_path):
    """A converted HuBERT model drives the same decode surfaces as
    wav2vec2: greedy batch, word timestamps, beam search, and forced
    alignment (the 'every surface works' claim of the family support)."""
    import jax.numpy as jnp
    import torch
    import transformers

    from gsoc_wav2vec2_tpu.convert.torch_to_jax import params_from_hf_model
    from gsoc_wav2vec2_tpu.evaluation import GreedyCTCEvaluator

    cfg = tiny_config()
    torch.manual_seed(0)
    hf_model = transformers.HubertForCTC(hubert_hf_config(cfg)).eval()
    params = params_from_hf_model(hf_model, cfg)
    speech = np.random.RandomState(5).randn(2, 4000).astype(np.float32)

    ev = GreedyCTCEvaluator(cfg, params, compute_dtype=jnp.float32)
    texts = ev.predict_batch(speech)
    segs = ev.predict_segments(speech)
    assert [t for t, _ in segs] == texts
    beam = GreedyCTCEvaluator(
        cfg, params, compute_dtype=jnp.float32, beam_width=4
    )
    beam_texts = beam.predict_batch(speech)
    assert all(isinstance(t, str) for t in beam_texts)
    text, words = ev.align_segments(speech[0], "HELLO WORLD")
    assert text == "HELLO WORLD"
    assert [w["word"] for w in words] == ["HELLO", "WORLD"]


def test_feat_proj_layer_norm_stays_out_of_reference_json():
    """Extension-field contract: the default (True) is omitted from
    config.json so reference load-back keeps working; False is written."""
    cfg = tiny_config()
    assert "feat_proj_layer_norm" not in cfg.to_dict()
    assert tiny_config(feat_proj_layer_norm=False).to_dict()[
        "feat_proj_layer_norm"
    ] is False
