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
