"""Reference H5 checkpoint interop: load a REAL `tf_model.h5` written by the
reference implementation (imported read-only from /root/reference) and check
logits parity against the reference TF model itself.

This validates the exact on-disk contract users migrating from the
reference depend on (`from_pretrained(<dir with tf_model.h5>)`).
"""

import sys

import numpy as np
import pytest

from tests.utils import is_available

pytestmark = pytest.mark.skipif(
    not is_available("tensorflow"), reason="requires tensorflow"
)

REF_SRC = "/root/reference/src"
SEQLEN = 48000  # >= 128 encoder frames (reference pos-conv kernel needs it)


@pytest.fixture(scope="module")
def reference_h5(tmp_path_factory):
    """Build a tiny reference TF model (random weights) and save_pretrained it."""
    import os

    os.environ["TF_USE_LEGACY_KERAS"] = "1"  # reference is Keras-2 era
    sys.path.insert(0, REF_SRC)
    try:
        import tensorflow as tf
        from wav2vec2 import Wav2Vec2Config as RefConfig
        from wav2vec2 import Wav2Vec2ForCTC as RefForCTC

        tf.random.set_seed(0)
        ref_cfg = RefConfig(
            hidden_size=64,
            num_heads=4,
            num_layers=2,
            intermediate_size=128,
            filter_sizes=[32] * 7,
            kernal_sizes=[10, 3, 3, 3, 3, 2, 2],
            strides=[5, 2, 2, 2, 2, 2, 2],
            dropout=0.0,
            apply_spec_augment=False,
        )
        model = RefForCTC(ref_cfg, input_shape=(1, SEQLEN))
        save_dir = str(tmp_path_factory.mktemp("ref_ckpt"))
        model.save_pretrained(save_dir)

        speech = np.random.RandomState(0).randn(2, SEQLEN).astype(np.float32)
        expected = model(tf.constant(speech), training=False).numpy()
        return save_dir, speech, expected
    finally:
        sys.path.remove(REF_SRC)


def test_from_pretrained_reads_reference_h5(reference_h5):
    save_dir, speech, expected = reference_h5
    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC

    model = Wav2Vec2ForCTC.from_pretrained(save_dir)
    got = np.asarray(model(speech))
    assert got.shape == expected.shape
    # reference's own cross-framework tolerance for logits (test_wav2vec2.py)
    np.testing.assert_allclose(got, expected, atol=0.004)


def test_h5_missing_variable_raises(reference_h5, tmp_path):
    """Corrupt checkpoint (dropped variable) must fail loudly, not silently
    keep random init."""
    import h5py
    import shutil
    import os

    save_dir, _, _ = reference_h5
    broken_dir = str(tmp_path / "broken")
    shutil.copytree(save_dir, broken_dir)
    path = os.path.join(broken_dir, "tf_model.h5")

    with h5py.File(path, "a") as f:
        # drop one q_proj kernel dataset wherever it lives
        def find(name):
            return "q_proj/kernel" in name if isinstance(name, str) else False

        victims = []
        f.visit(lambda n: victims.append(n) if "q_proj" in n and "kernel" in n else None)
        assert victims, "fixture layout changed?"
        del f[victims[0]]
        # also fix up weight_names attrs if present
        for g in f.values():
            if "weight_names" in getattr(g, "attrs", {}):
                names = [
                    n for n in g.attrs["weight_names"]
                    if victims[0] not in (n.decode() if isinstance(n, bytes) else n)
                ]
                g.attrs["weight_names"] = names

    from gsoc_wav2vec2_tpu import Wav2Vec2ForCTC

    with pytest.raises((KeyError, ValueError)):
        Wav2Vec2ForCTC.from_pretrained(broken_dir)


def test_reference_loads_our_h5(tmp_path):
    """The switch-back path: a model saved HERE with `save_h5=True` must
    load through the REFERENCE's Keras `from_pretrained` and reproduce our
    logits — the inverse of `test_from_pretrained_reads_reference_h5`."""
    import os

    import jax.numpy as jnp

    from gsoc_wav2vec2_tpu import Wav2Vec2Config, Wav2Vec2ForCTC

    config = Wav2Vec2Config(
        hidden_size=64,
        num_heads=4,
        num_layers=2,
        intermediate_size=128,
        filter_sizes=[32] * 7,
        kernal_sizes=[10, 3, 3, 3, 3, 2, 2],
        strides=[5, 2, 2, 2, 2, 2, 2],
        dropout=0.0,
        apply_spec_augment=False,
    )
    model = Wav2Vec2ForCTC(config, seed=3)
    save_dir = str(tmp_path / "ours")
    model.save_pretrained(save_dir, save_h5=True)
    assert os.path.isfile(os.path.join(save_dir, "tf_model.h5"))

    speech = np.random.RandomState(1).randn(2, SEQLEN).astype(np.float32)
    ours = np.asarray(
        model(jnp.asarray(speech), training=False), np.float32
    )

    os.environ["TF_USE_LEGACY_KERAS"] = "1"
    sys.path.insert(0, REF_SRC)
    try:
        import tensorflow as tf
        from wav2vec2 import Wav2Vec2ForCTC as RefForCTC

        ref_model = RefForCTC.from_pretrained(
            save_dir, input_shape=(1, SEQLEN)
        )
        theirs = ref_model(tf.constant(speech), training=False).numpy()
    finally:
        sys.path.remove(REF_SRC)

    np.testing.assert_allclose(ours, theirs, atol=2e-4)
