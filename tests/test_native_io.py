"""Native IO library tests: TFRecord codec (vs. TensorFlow as oracle),
WAV decode (vs. tf.audio.decode_wav), FLAC decode (vs. synthesised streams
covering every subframe/stereo branch).

Mirrors the reference's `tests/test_dataloader.py` oracle style: golden
comparison against the framework the on-disk formats come from.
"""

import os

import numpy as np
import pytest

from gsoc_wav2vec2_tpu.data import native_io

tf = pytest.importorskip("tensorflow")

REF_DATA = "/root/reference/data"


def _random_sample(rng, n=1000, u=12):
    speech = rng.standard_normal(n).astype(np.float32)
    label = rng.integers(0, 32, size=u).astype(np.int32)
    return speech, label


def test_tfrecord_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    samples = [_random_sample(rng, n, u) for n, u in [(1000, 12), (5, 1), (40000, 128)]]
    path = str(tmp_path / "a.tfrecord")
    with native_io.TFRecordWriter(path) as w:
        for speech, label in samples:
            w.write(speech, label)
    got = list(native_io.read_tfrecords(path))
    assert len(got) == len(samples)
    for (s0, l0), (s1, l1) in zip(samples, got):
        np.testing.assert_array_equal(s0, s1)
        np.testing.assert_array_equal(l0, l1)


def test_tfrecord_native_write_tf_read(tmp_path):
    """Records written by the native writer parse with the exact pipeline
    the reference uses (`data_utils.py:17-27`)."""
    rng = np.random.default_rng(1)
    speech, label = _random_sample(rng)
    path = str(tmp_path / "b.tfrecord")
    with native_io.TFRecordWriter(path) as w:
        w.write(speech, label)

    desc = {
        "speech": tf.io.FixedLenFeature((), tf.string),
        "label": tf.io.FixedLenFeature((), tf.string),
    }
    ds = tf.data.TFRecordDataset([path])
    for record in ds:
        parsed = tf.io.parse_single_example(record, desc)
        got_speech = tf.io.parse_tensor(parsed["speech"], out_type=tf.float32)
        got_label = tf.io.parse_tensor(parsed["label"], out_type=tf.int32)
        np.testing.assert_array_equal(speech, got_speech.numpy())
        np.testing.assert_array_equal(label, got_label.numpy())


def test_tfrecord_tf_write_native_read(tmp_path):
    """Shards written exactly as the reference writes them
    (`make_tfrecords.py:10-23`) read back through the native reader."""
    rng = np.random.default_rng(2)
    samples = [_random_sample(rng, n, u) for n, u in [(777, 9), (1234, 77)]]
    path = str(tmp_path / "c.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        for speech, label in samples:
            feature = {
                "speech": tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[tf.io.serialize_tensor(tf.constant(speech)).numpy()]
                    )
                ),
                "label": tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[tf.io.serialize_tensor(tf.constant(label)).numpy()]
                    )
                ),
            }
            example = tf.train.Example(features=tf.train.Features(feature=feature))
            w.write(example.SerializeToString())

    got = list(native_io.read_tfrecords(path))
    assert len(got) == len(samples)
    for (s0, l0), (s1, l1) in zip(samples, got):
        np.testing.assert_array_equal(s0, s1)
        np.testing.assert_array_equal(l0, l1)


def test_tfrecord_corruption_detected(tmp_path):
    rng = np.random.default_rng(3)
    speech, label = _random_sample(rng)
    path = str(tmp_path / "d.tfrecord")
    with native_io.TFRecordWriter(path) as w:
        w.write(speech, label)
    raw = bytearray(open(path, "rb").read())
    raw[40] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(OSError):
        list(native_io.read_tfrecords(path))


@pytest.mark.parametrize("fixture", ["sample.wav", "SA2.wav"])
def test_wav_decode_matches_tf(fixture):
    path = os.path.join(REF_DATA, fixture)
    if not os.path.isfile(path):
        pytest.skip("reference fixture unavailable")
    audio, rate = native_io.decode_wav(path)
    ref_audio, ref_rate = tf.audio.decode_wav(tf.io.read_file(path))
    np.testing.assert_allclose(audio, tf.squeeze(ref_audio).numpy(), atol=0)
    assert rate == int(ref_rate)


# --- FLAC ------------------------------------------------------------------

from flac_encoder import encode_flac  # noqa: E402


def _int16_signal(rng, n):
    # band-limited-ish signal so fixed/LPC predictors leave small residuals
    t = np.arange(n)
    sig = 3000 * np.sin(t / 7.0) + 500 * np.sin(t / 3.1) + rng.integers(-40, 40, n)
    return np.clip(sig, -32768, 32767).astype(np.int64)


def _decode_bytes(data, tmp_path, name="x.flac"):
    path = str(tmp_path / name)
    with open(path, "wb") as f:
        f.write(data)
    return native_io.decode_flac(path)


@pytest.mark.parametrize(
    "kind,kw",
    [
        ("verbatim", {}),
        ("constant", {}),
        ("fixed", {"order": 0, "rice_param": 14}),
        ("fixed", {"order": 1, "rice_param": 8}),
        ("fixed", {"order": 2, "rice_param": 6}),
        ("fixed", {"order": 3, "rice_param": 6}),
        ("fixed", {"order": 4, "rice_param": 6}),
        ("fixed", {"order": 2, "rice_param": 6, "partition_order": 2}),
        ("fixed", {"order": 2, "escape_bits": 17}),
        ("lpc", {"order": 2, "lpc_coefs": [3, -2], "lpc_shift": 1, "rice_param": 7}),
        ("lpc", {"order": 5, "lpc_coefs": [2, 1, -1, 1, -1], "lpc_shift": 2,
                 "rice_param": 9, "lpc_precision": 10}),
    ],
)
def test_flac_mono_subframe_kinds(tmp_path, kind, kw):
    rng = np.random.default_rng(4)
    n = 4096 + 1500  # exercise a short trailing frame
    sig = (
        np.full(n, 123, np.int64)
        if kind == "constant"
        else _int16_signal(rng, n)
    )
    data = encode_flac(sig, subframe_kind=kind, **kw)
    audio, rate = _decode_bytes(data, tmp_path, f"{kind}.flac")
    assert rate == 16000
    np.testing.assert_array_equal(
        np.round(audio * 32768.0).astype(np.int64), sig
    )


@pytest.mark.parametrize(
    "assignment", ["independent", "left_side", "right_side", "mid_side"]
)
def test_flac_stereo_assignments(tmp_path, assignment):
    rng = np.random.default_rng(5)
    n = 2048
    left = _int16_signal(rng, n)
    right = np.clip(left // 2 + rng.integers(-100, 100, n), -32768, 32767)
    sig = np.stack([left, right], axis=1)
    data = encode_flac(
        sig, blocksize=1024, subframe_kind="fixed", order=2, rice_param=7,
        channel_assignment=assignment,
    )
    audio, _ = _decode_bytes(data, tmp_path, f"{assignment}.flac")
    # decoder returns the first channel
    np.testing.assert_array_equal(np.round(audio * 32768.0).astype(np.int64), left)


def test_flac_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.flac")
    with open(path, "wb") as f:
        f.write(b"not a flac stream at all")
    with pytest.raises(OSError):
        native_io.decode_flac(path)


def test_flac_batch_decode_parallel(tmp_path):
    """Threaded batch decode matches per-file decode, preserves order, and
    reports failures by name."""
    from gsoc_wav2vec2_tpu.data.native_io import decode_flac, decode_flac_batch

    rng = np.random.default_rng(9)
    paths = []
    for i in range(12):
        sig = _int16_signal(rng, 3000 + 257 * i)
        p = str(tmp_path / f"s{i}.flac")
        with open(p, "wb") as f:
            f.write(encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7))
        paths.append(p)

    batch = decode_flac_batch(paths, num_threads=4)
    assert len(batch) == len(paths)
    for p, (audio, rate) in zip(paths, batch):
        ref_audio, ref_rate = decode_flac(p)
        np.testing.assert_array_equal(audio, ref_audio)
        assert rate == ref_rate

    bad = str(tmp_path / "bad.flac")
    with open(bad, "wb") as f:
        f.write(b"junk")
    with pytest.raises(OSError, match="bad.flac"):
        decode_flac_batch(paths[:2] + [bad], num_threads=4)
