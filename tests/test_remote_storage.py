"""Remote (object-store) storage leg: gs://-style paths through fsspec.

The reference streams tfrecords and checkpoints from GCS
(`/root/reference/src/main.py:60-90`, `training_utils.py:38-45`); these
tests exercise the same flows against fsspec's in-memory filesystem
(`memory://`), which shares the exact code path `gs://` takes (only the
protocol implementation differs).
"""

import os

import fsspec
import numpy as np
import pytest

from gsoc_wav2vec2_tpu.data import native_io, remote
from gsoc_wav2vec2_tpu.data.loaders import (
    LibriSpeechDataLoader,
    LibriSpeechDataLoaderArgs,
    find_files,
)


@pytest.fixture()
def memfs():
    fs = fsspec.filesystem("memory")
    yield fs
    # memory filesystem is process-global: isolate tests
    for path in list(fs.store):
        try:
            fs.rm(path)
        except FileNotFoundError:
            pass


def _write_shard(fs, url_path, samples):
    """Write a TFRecord shard locally with the native writer, then copy the
    bytes into the memory filesystem."""
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".tfrecord", delete=False) as tmp:
        local = tmp.name
    try:
        with native_io.TFRecordWriter(local) as w:
            for speech, label in samples:
                w.write(speech, label)
        with open(local, "rb") as f:
            data = f.read()
        with fs.open(url_path, "wb") as f:
            f.write(data)
    finally:
        os.unlink(local)


def test_is_remote_path():
    assert remote.is_remote_path("gs://bucket/x.tfrecord")
    assert remote.is_remote_path("memory://a/b")
    assert not remote.is_remote_path("/abs/local/path")
    assert not remote.is_remote_path("relative/path")


def test_expand_patterns_remote_glob(memfs):
    for name in ("train-0.tfrecord", "train-1.tfrecord", "other.txt"):
        with memfs.open(f"/bucket/{name}", "wb") as f:
            f.write(b"x")
    got = remote.expand_patterns(["memory://bucket/*.tfrecord"])
    assert got == [
        memfs.unstrip_protocol("/bucket/train-0.tfrecord"),
        memfs.unstrip_protocol("/bucket/train-1.tfrecord"),
    ]
    # no matches: pattern kept verbatim (loader will fail loudly, same
    # contract as the local leg)
    assert remote.expand_patterns(["memory://bucket/none-*.tfrecord"]) == [
        "memory://bucket/none-*.tfrecord"
    ]


def test_read_tfrecords_bytes_roundtrip(memfs):
    rng = np.random.default_rng(0)
    samples = [
        (rng.standard_normal(50).astype(np.float32),
         np.asarray([4, 5, 6], np.int32)),
        (rng.standard_normal(75).astype(np.float32),
         np.asarray([7, 8], np.int32)),
    ]
    _write_shard(memfs, "/bucket/s.tfrecord", samples)

    got = list(remote.read_tfrecords_any("memory://bucket/s.tfrecord"))
    assert len(got) == 2
    for (want_s, want_l), (got_s, got_l) in zip(samples, got):
        np.testing.assert_array_equal(want_s, got_s)
        np.testing.assert_array_equal(want_l, got_l)


def test_loader_streams_remote_tfrecords(memfs):
    rng = np.random.default_rng(1)
    samples = [
        (rng.standard_normal(100).astype(np.float32),
         np.asarray([5, 6, 7, 8], np.int32))
        for _ in range(4)
    ]
    _write_shard(memfs, "/bucket/train-0.tfrecord", samples[:2])
    _write_shard(memfs, "/bucket/train-1.tfrecord", samples[2:])

    loader = LibriSpeechDataLoader(
        LibriSpeechDataLoaderArgs(
            from_tfrecords=True,
            tfrecords=remote.expand_patterns(["memory://bucket/train-*.tfrecord"]),
            batch_size=4,
            audio_maxlen=100,
            labels_maxlen=8,
        )
    )
    batches = list(loader(drop_remainder=True))
    assert len(batches) == 1
    assert batches[0]["speech"].shape == (4, 100)
    # all four waveforms arrive (file order deterministic without a seed)
    want = np.stack([s for s, _ in samples])
    np.testing.assert_allclose(batches[0]["speech"], want, rtol=1e-6)


def test_find_files_and_raw_corpus_remote(memfs):
    """Raw LibriSpeech-layout corpus living in an object store: transcript
    discovery, FLAC fetch + in-memory decode."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac

    sig = np.clip(
        1500 * np.sin(np.arange(3000) / 5.0), -32768, 32767
    ).astype(np.int64)
    with memfs.open("/corpus/1/2/1-2-0000.flac", "wb") as f:
        f.write(encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7))
    with memfs.open("/corpus/1/2/1-2.trans.txt", "wb") as f:
        f.write(b"1-2-0000 HELLO REMOTE WORLD")

    assert find_files("memory://corpus", ".flac") == [
        memfs.unstrip_protocol("/corpus/1/2/1-2-0000.flac")
    ]

    loader = LibriSpeechDataLoader(
        LibriSpeechDataLoaderArgs(
            data_dir="memory://corpus", batch_size=1,
            audio_maxlen=3000, labels_maxlen=32,
        )
    )
    batches = list(loader(drop_remainder=False))
    assert len(batches) == 1
    text = loader.tokenizer.decode(batches[0]["labels"][0], group_tokens=False)
    assert text == "HELLO REMOTE WORLD"
    # decoded audio matches a local decode of the same bytes
    want, rate = native_io.decode_flac_bytes(
        memfs.open("/corpus/1/2/1-2-0000.flac", "rb").read()
    )
    assert rate == 16000
    got = np.asarray(batches[0]["speech"][0])
    norm = (want - want.mean()) / np.sqrt(want.var() + 1e-5)
    np.testing.assert_allclose(got, norm, atol=1e-5)


def test_decode_buffer_matches_file_decode(tmp_path):
    """Buffer entry points must be bit-identical to the file entry points."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac

    sig = np.clip(
        900 * np.sin(np.arange(2000) / 7.0), -32768, 32767
    ).astype(np.int64)
    data = encode_flac(sig, subframe_kind="fixed", order=1, rice_param=6)
    p = tmp_path / "x.flac"
    p.write_bytes(data)
    a, ra = native_io.decode_flac(str(p))
    b, rb = native_io.decode_flac_bytes(data)
    assert ra == rb
    np.testing.assert_array_equal(a, b)


def test_checkpoint_manager_preserves_remote_urls(monkeypatch, tmp_path):
    """`gs://` checkpoint dirs must reach Orbax un-mangled (no abspath/
    makedirs on URLs); local dirs keep the abspath+create behaviour."""
    import orbax.checkpoint as ocp

    from gsoc_wav2vec2_tpu.training.checkpoint import CheckpointManager

    captured = {}

    class FakeManager:
        def __init__(self, directory, options=None):
            captured["directory"] = directory

        def close(self):
            pass

    monkeypatch.setattr(ocp, "CheckpointManager", FakeManager)

    CheckpointManager("gs://bucket/ckpts/stage1").close()
    assert captured["directory"] == "gs://bucket/ckpts/stage1"

    local = str(tmp_path / "sub" / "ckpts")
    CheckpointManager(local).close()
    assert captured["directory"] == os.path.abspath(local)
    assert os.path.isdir(local)


def test_save_and_load_pretrained_remote(memfs):
    """The trainer's final `save_pretrained(gs://...)` must write to the
    bucket (not a literal local 'gs:/' directory) and load back via
    `from_pretrained` — the multi-host final-artifact path."""
    import jax
    import numpy as np_

    from gsoc_wav2vec2_tpu import Wav2Vec2Config, Wav2Vec2ForCTC

    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    model = Wav2Vec2ForCTC(config, seed=5)
    url = "memory://bucket/run/final"
    model.save_pretrained(url)

    assert memfs.exists("/bucket/run/final/config.json")
    assert memfs.exists("/bucket/run/final/jax_model.msgpack")
    assert not os.path.exists("memory:")  # no mangled local dir

    reloaded = Wav2Vec2ForCTC.from_pretrained(url)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(model.params),
        jax.tree_util.tree_leaves_with_path(reloaded.params),
    ):
        assert pa == pb
        np_.testing.assert_array_equal(np_.asarray(a), np_.asarray(b))


def test_fetch_bytes_batch_mixed_protocols(memfs, tmp_path):
    """A mixed memory:// + file:// URL list must fetch each object from its
    OWN store (the old code resolved the filesystem from urls[0] only)."""
    with memfs.open("/bucket/a.bin", "wb") as f:
        f.write(b"mem-a")
    local = tmp_path / "b.bin"
    local.write_bytes(b"file-b")
    with memfs.open("/bucket/c.bin", "wb") as f:
        f.write(b"mem-c")
    got = remote.fetch_bytes_batch(
        ["memory://bucket/a.bin", f"file://{local}", "memory://bucket/c.bin"]
    )
    assert got == [b"mem-a", b"file-b", b"mem-c"]
