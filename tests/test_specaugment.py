"""SpecAugment unit tests (the reference ships none — its masking only ran
implicitly inside training; semantics from `spec_augment.py:43-128`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsoc_wav2vec2_tpu.ops.specaugment import (
    apply_spec_augmentation,
    compute_mask_indices,
)


def test_mask_shape_and_span_structure():
    mask = np.asarray(
        compute_mask_indices(jax.random.PRNGKey(0), 4, 500, 0.05, 10)
    )
    assert mask.shape == (4, 500)
    for row in mask:
        # masked frames come in runs; each run's length is >= mask_length
        # only when spans don't merge — but every run is a union of length-10
        # spans, so run lengths are at least 10
        runs = []
        cur = 0
        for v in row:
            if v:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        assert runs, "min_masks=2 guarantees masking"
        assert all(r >= 10 for r in runs)


def test_mask_fraction_tracks_mask_prob():
    """E[masked fraction] ~= mask_prob (modulo overlap and min_masks)."""
    mask = np.asarray(
        compute_mask_indices(jax.random.PRNGKey(1), 64, 1000, 0.05, 10)
    )
    frac = mask.mean()
    assert 0.03 < frac < 0.08


def test_min_masks_enforced():
    # tiny prob would give 0 spans; min_masks=2 forces 2 distinct starts.
    # Spans may still overlap (starts are distinct, spans need not be), so
    # the guaranteed union is mask_length + 1 frames.
    mask = np.asarray(
        compute_mask_indices(jax.random.PRNGKey(2), 8, 400, 0.0001, 10)
    )
    per_row = mask.sum(axis=1)
    assert (per_row >= 11).all()
    assert (per_row <= 20).all()  # exactly 2 spans' worth


def test_mask_length_longer_than_seq_raises():
    with pytest.raises(ValueError):
        compute_mask_indices(jax.random.PRNGKey(0), 1, 5, 0.1, 10)


def test_apply_replaces_with_embedding_only_on_mask():
    rng = jax.random.PRNGKey(3)
    feats = jnp.zeros((2, 300, 16)) + 7.0
    embed = jnp.arange(16, dtype=jnp.float32)
    out = np.asarray(
        apply_spec_augmentation(rng, feats, embed, 0.05, 10)
    )
    is_masked = ~(out == 7.0).all(axis=-1)
    assert is_masked.any()
    np.testing.assert_array_equal(out[is_masked], np.tile(np.arange(16), (is_masked.sum(), 1)))
    np.testing.assert_array_equal(out[~is_masked], 7.0)


def test_keys_give_different_masks_and_jit_does_not_freeze():
    """The reference's host-np RNG froze the mask per trace
    (`spec_augment.py:13-14`); ours must vary per key under one jit."""
    f = jax.jit(
        lambda k: compute_mask_indices(k, 2, 400, 0.05, 10)
    )
    m1 = np.asarray(f(jax.random.PRNGKey(0)))
    m2 = np.asarray(f(jax.random.PRNGKey(1)))
    assert (m1 != m2).any()
    np.testing.assert_array_equal(m1, np.asarray(f(jax.random.PRNGKey(0))))


# -- feature-axis masking (EXTENSION: HF `mask_feature_prob`) ---------------


def test_feature_masking_zeroes_whole_dims_across_time():
    from gsoc_wav2vec2_tpu.ops.specaugment import apply_feature_masking

    feats = jnp.zeros((2, 60, 128)) + 3.0
    out = np.asarray(
        apply_feature_masking(jax.random.PRNGKey(5), feats, 0.2, 8)
    )
    zeroed = (out == 0.0).all(axis=1)  # (B, H): dim zero at EVERY step
    intact = (out == 3.0).all(axis=1)
    assert np.all(zeroed | intact), "a dim must be fully masked or untouched"
    assert zeroed.any() and intact.any()
    # spans: zeroed dims come in runs of mask_length (possibly merged)
    for row in zeroed:
        padded = np.concatenate([[False], row, [False]])
        edges = np.flatnonzero(np.diff(padded.astype(int)))
        for lo, hi in zip(edges[::2], edges[1::2]):
            assert hi - lo >= 8


def test_feature_masking_min_masks_zero_and_determinism():
    from gsoc_wav2vec2_tpu.ops.specaugment import apply_feature_masking

    feats = jnp.ones((4, 10, 64))
    out1 = np.asarray(
        apply_feature_masking(jax.random.PRNGKey(0), feats, 0.01, 10, 0)
    )
    out2 = np.asarray(
        apply_feature_masking(jax.random.PRNGKey(0), feats, 0.01, 10, 0)
    )
    np.testing.assert_array_equal(out1, out2)
    assert np.isfinite(out1).all()


@pytest.mark.slow
def test_forward_with_feature_masking_masks_and_backprops():
    """Training forward with mask_feature_prob > 0 runs, differs from the
    time-mask-only path, and gradients stay finite."""
    from gsoc_wav2vec2_tpu import Wav2Vec2Config
    from gsoc_wav2vec2_tpu.models.modeling import (
        init_wav2vec2_for_ctc_params,
        wav2vec2_for_ctc_forward,
    )

    tiny = dict(
        hidden_size=32, num_heads=2, num_layers=2, intermediate_size=64,
        filter_sizes=[16, 16], kernal_sizes=[10, 3], strides=[5, 2],
        dropout=0.0, survival_prob=1.0,
    )
    config_on = Wav2Vec2Config(
        **tiny, mask_feature_prob=0.3, mask_feature_length=4,
        mask_feature_min_masks=1,
    )
    config_off = Wav2Vec2Config(**tiny)
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config_on)
    speech = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 2000)), jnp.float32
    )
    rng = jax.random.PRNGKey(7)

    def loss(p, cfg):
        out = wav2vec2_for_ctc_forward(p, cfg, speech, training=True, rng=rng)
        return jnp.sum(out**2)

    on, g = jax.value_and_grad(loss)(params, config_on)
    off = loss(params, config_off)
    assert np.isfinite(float(on)) and float(on) != float(off)
    flat, _ = jax.tree.flatten(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_config_extension_fields_json_contract(tmp_path):
    """Defaults stay OUT of config.json (the reference's `cls(**json)`
    must still load a dir saved here); non-default values round-trip."""
    import json as jsonlib

    from gsoc_wav2vec2_tpu import Wav2Vec2Config

    plain = Wav2Vec2Config()
    plain.save_pretrained(str(tmp_path / "plain"))
    with open(tmp_path / "plain" / "config.json") as f:
        d = jsonlib.load(f)
    assert "mask_feature_prob" not in d
    assert "mask_feature_length" not in d

    masked = Wav2Vec2Config(mask_feature_prob=0.25, mask_feature_length=12)
    masked.save_pretrained(str(tmp_path / "masked"))
    back = Wav2Vec2Config.from_json(
        str(tmp_path / "masked" / "config.json")
    )
    assert back.mask_feature_prob == 0.25 and back.mask_feature_length == 12

    with pytest.raises(ValueError, match="mask_feature_prob"):
        Wav2Vec2Config(mask_feature_prob=1.5)
