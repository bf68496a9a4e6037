"""Config JSON round-trip + processor behaviour (reference contracts)."""

import json
import os

import numpy as np
import pytest

from gsoc_wav2vec2_tpu import RobustWav2Vec2Config, Wav2Vec2Config, Wav2Vec2Processor


def test_config_defaults_match_reference_schema():
    cfg = Wav2Vec2Config()
    assert cfg.vocab_size == 32
    assert cfg.hidden_size == 768
    assert cfg.num_layers == 12
    assert cfg.kernal_sizes == [10, 3, 3, 3, 3, 2, 2]
    assert cfg.strides == [5, 2, 2, 2, 2, 2, 2]
    assert cfg.attention_norm_type == "postnorm"
    assert not cfg.is_robust

    robust = RobustWav2Vec2Config()
    assert robust.hidden_size == 1024
    assert robust.num_layers == 24
    assert robust.attention_norm_type == "prenorm"
    assert robust.feature_extractor_norm_type == "layer"
    assert robust.conv_bias


def test_config_json_roundtrip(tmp_path):
    cfg = RobustWav2Vec2Config(num_layers=2)
    cfg.save_pretrained(str(tmp_path))
    path = os.path.join(str(tmp_path), "config.json")
    assert os.path.isfile(path)
    loaded = RobustWav2Vec2Config.from_json(path)
    assert loaded == cfg
    # JSON keys must match the reference schema (incl. `kernal_sizes` typo)
    with open(path) as f:
        keys = set(json.load(f).keys())
    assert "kernal_sizes" in keys
    assert "mask_time_prob" in keys


def test_config_reads_reference_config_json(tmp_path):
    """A config.json produced by the reference dataclass loads unchanged."""
    ref_dict = {
        "vocab_size": 32, "dropout": 0.1, "hidden_size": 768, "num_heads": 12,
        "num_layers": 12, "intermediate_size": 3072, "is_gelu_approx": False,
        "layer_norm_eps": 1e-05, "survival_prob": 1.0, "pad_id": 0,
        "num_conv_pos_embeddings": 128, "num_conv_pos_embedding_groups": 16,
        "filter_sizes": [512] * 7, "kernal_sizes": [10, 3, 3, 3, 3, 2, 2],
        "strides": [5, 2, 2, 2, 2, 2, 2], "conv_bias": False,
        "apply_spec_augment": True, "mask_time_prob": 0.05,
        "mask_time_length": 10, "attention_norm_type": "postnorm",
        "feature_extractor_norm_type": "group", "is_robust": False,
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(ref_dict))
    cfg = Wav2Vec2Config.from_json(str(p))
    assert cfg.hidden_size == 768


def test_config_validation():
    with pytest.raises(ValueError):
        Wav2Vec2Config(hidden_size=100, num_heads=3)
    with pytest.raises(ValueError):
        Wav2Vec2Config(filter_sizes=[512], kernal_sizes=[10, 3], strides=[5])
    with pytest.raises(ValueError):
        Wav2Vec2Config(attention_norm_type="nonorm")


def test_conv_output_length():
    cfg = Wav2Vec2Config()
    # 246000 samples -> 768 frames (reference `main.py:48-51`)
    assert cfg.conv_output_length(246000) == 768
    assert cfg.conv_output_length(50000) == 156
    assert cfg.conv_output_length(16000) == 49


def test_tokenizer_roundtrip():
    tok = Wav2Vec2Processor(is_tokenizer=True)
    ids = tok("how is life gooing? what's up.. yayy i got results. it's awe-some")
    text = tok.decode(ids, group_tokens=False)
    assert text == "HOW IS LIFE GOOING WHAT'S UP YAYY I GOT RESULTS IT'S AWE SOME"


def test_tokenizer_special_rules():
    tok = Wav2Vec2Processor(is_tokenizer=True)
    # `-` becomes a space, punctuation stripped, lowercase uppercased
    assert tok.decode(tok("awe-some"), group_tokens=False) == "AWE SOME"
    # unknown chars (digits) dropped by the regex
    assert tok.decode(tok("a1b2"), group_tokens=False) == "AB"
    # vocab ids must match the reference vocab.json exactly
    assert tok("E")[0] == 5
    assert tok(" ")[0] == 4
    assert tok.token_to_id_mapping["<pad>"] == 0


def test_ctc_decode_groups_repeats():
    tok = Wav2Vec2Processor(is_tokenizer=True)
    # H H <pad> E L L <pad> L O  -> HELLO (pad separates repeated L)
    ids = [11, 11, 0, 5, 15, 15, 0, 15, 8]
    assert tok.decode(ids) == "HELLO"


def test_feature_extractor_normalization():
    proc = Wav2Vec2Processor(is_tokenizer=False)
    x = np.random.RandomState(0).randn(1, 4000).astype(np.float32) * 3 + 1
    out = np.asarray(proc(x))
    assert out.shape == (4000,)  # squeezed, reference `processor.py:106`
    np.testing.assert_allclose(out.mean(), 0.0, atol=1e-3)
    np.testing.assert_allclose(out.std(), 1.0, atol=1e-2)
    # exact formula: (x - mean) / sqrt(var + 1e-5), population variance
    expected = (x - x.mean(-1, keepdims=True)) / np.sqrt(
        x.var(-1, keepdims=True) + 1e-5
    )
    np.testing.assert_allclose(out, expected.squeeze(), rtol=1e-5, atol=1e-5)


def test_robust_pretraining_geometry_matches_robust():
    """`RobustWav2Vec2PretrainingConfig` must repeat EVERY geometry override
    of `RobustWav2Vec2Config` verbatim (dataclass diamond inheritance cannot
    merge the two override sets, so the repetition is deliberate — this test
    is what keeps the two classes from silently diverging)."""
    from dataclasses import MISSING, fields

    from gsoc_wav2vec2_tpu import (
        RobustWav2Vec2PretrainingConfig,
        Wav2Vec2PretrainingConfig,
    )

    base = {f.name: f.default for f in fields(Wav2Vec2Config)}
    robust = {f.name: f.default for f in fields(RobustWav2Vec2Config)}
    robust_pre = {f.name: f.default for f in fields(RobustWav2Vec2PretrainingConfig)}
    pre = {f.name: f.default for f in fields(Wav2Vec2PretrainingConfig)}

    overridden = {
        name for name, default in robust.items()
        if name in base and default != base[name] and default is not MISSING
    }
    assert overridden  # the robust family IS a geometry override set
    for name in overridden:
        assert robust_pre[name] == robust[name], (
            f"RobustWav2Vec2PretrainingConfig.{name} = {robust_pre[name]!r} "
            f"diverged from RobustWav2Vec2Config's {robust[name]!r}"
        )
    # and the pretraining fields survive the robust overrides
    assert robust_pre["mask_time_prob"] == pre["mask_time_prob"]
    assert robust_pre["num_negatives"] == pre["num_negatives"]
