"""Shared test helpers: capability gating + tiny parity configs.

Mirrors the reference's gating style (`/root/reference/tests/utils.py`):
skip—don't mock—when torch/transformers are unavailable.
"""

import importlib.util

import pytest


def is_available(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


requires_torch = pytest.mark.skipif(
    not is_available("torch"), reason="requires torch"
)
requires_transformers = pytest.mark.skipif(
    not (is_available("torch") and is_available("transformers")),
    reason="requires torch + transformers",
)
requires_tf = pytest.mark.skipif(
    not is_available("tensorflow"), reason="requires tensorflow"
)


def tiny_config(robust: bool = False, **kwargs):
    """Small config for fast CPU parity tests; full conv-stack geometry."""
    from gsoc_wav2vec2_tpu import RobustWav2Vec2Config, Wav2Vec2Config

    base = dict(
        vocab_size=32,
        hidden_size=64,
        num_heads=4,
        num_layers=2,
        intermediate_size=128,
        filter_sizes=[32] * 7,
        kernal_sizes=[10, 3, 3, 3, 3, 2, 2],
        strides=[5, 2, 2, 2, 2, 2, 2],
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        dropout=0.0,
        apply_spec_augment=False,
    )
    base.update(kwargs)
    cls = RobustWav2Vec2Config if robust else Wav2Vec2Config
    return cls(**base)


def tiny_pretraining_config(robust: bool = False, **kwargs):
    """Small pretraining config (quantizer dims scaled down to match)."""
    from gsoc_wav2vec2_tpu import (
        RobustWav2Vec2PretrainingConfig,
        Wav2Vec2PretrainingConfig,
    )

    base = dict(
        vocab_size=32,
        hidden_size=64,
        num_heads=4,
        num_layers=2,
        intermediate_size=128,
        filter_sizes=[32] * 7,
        kernal_sizes=[10, 3, 3, 3, 3, 2, 2],
        strides=[5, 2, 2, 2, 2, 2, 2],
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        dropout=0.0,
        apply_spec_augment=False,
        num_codevector_groups=2,
        num_codevectors_per_group=16,
        codevector_dim=48,
        proj_codevector_dim=40,
        num_negatives=10,
    )
    base.update(kwargs)
    cls = RobustWav2Vec2PretrainingConfig if robust else Wav2Vec2PretrainingConfig
    return cls(**base)


def matching_hf_config(cfg):
    """Build the equivalent `transformers.Wav2Vec2Config`."""
    import transformers

    extra = {}
    for ours, theirs in [
        ("num_codevector_groups", "num_codevector_groups"),
        ("num_codevectors_per_group", "num_codevectors_per_group"),
        ("codevector_dim", "codevector_dim"),
        ("proj_codevector_dim", "proj_codevector_dim"),
        ("contrastive_logits_temperature", "contrastive_logits_temperature"),
        ("num_negatives", "num_negatives"),
        ("diversity_loss_weight", "diversity_loss_weight"),
        ("feat_quantizer_dropout", "feat_quantizer_dropout"),
    ]:
        if hasattr(cfg, ours):
            extra[theirs] = getattr(cfg, ours)

    return transformers.Wav2Vec2Config(
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
        hidden_dropout=cfg.dropout,
        attention_dropout=cfg.dropout,
        activation_dropout=cfg.dropout,
        feat_proj_dropout=cfg.dropout,
        final_dropout=cfg.dropout,
        layerdrop=0.0,
        apply_spec_augment=False,
        hidden_act="gelu",
        layer_norm_eps=cfg.layer_norm_eps,
        pad_token_id=cfg.pad_id,
        **extra,
    )
