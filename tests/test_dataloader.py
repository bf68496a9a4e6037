"""Data-pipeline tests, mirroring the reference's `tests/test_dataloader.py`
(batch shapes + exact decoded transcripts) — but self-contained: fixtures are
synthesised (FLAC via the test encoder, WAV via raw RIFF bytes) instead of
downloaded.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from flac_encoder import encode_flac
from gsoc_wav2vec2_tpu.data import (
    LibriSpeechDataLoader,
    LibriSpeechDataLoaderArgs,
    TimitDataLoader,
    TimitDataLoaderArgs,
    Wav2Vec2Processor,
)
from gsoc_wav2vec2_tpu.data.native_io import TFRecordWriter, read_tfrecords

TRANSCRIPTS = [
    "HELLO WORLD",
    "SHE HAD YOUR DARK SUIT",
    "DON'T ASK ME TO CARRY AN OILY RAG",
    "SPEECH RECOGNITION ON TPUS",
]


def _write_wav(path, pcm16, rate=16000):
    data = pcm16.astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)))
        f.write(data)


def _signal(rng, n):
    t = np.arange(n)
    sig = 2500 * np.sin(t / 9.0) + rng.integers(-50, 50, n)
    return np.clip(sig, -32768, 32767).astype(np.int64)


@pytest.fixture(scope="module")
def librispeech_dir(tmp_path_factory):
    """Two-level LibriSpeech-style layout: spk/chap/spk-chap-utt.flac +
    one spk-chap.trans.txt per chapter."""
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("LibriSpeech")
    chap = root / "19" / "198"
    chap.mkdir(parents=True)
    lines = []
    for i, text in enumerate(TRANSCRIPTS):
        file_id = f"19-198-{i:04d}"
        sig = _signal(rng, 8000 + 1000 * i)
        (chap / f"{file_id}.flac").write_bytes(
            encode_flac(sig, subframe_kind="fixed", order=2, rice_param=7)
        )
        lines.append(f"{file_id} {text}")
    # an orphan flac with no transcript must be discarded
    (chap / "19-198-9999.flac").write_bytes(
        encode_flac(_signal(rng, 5000), subframe_kind="verbatim")
    )
    (chap / "19-198.trans.txt").write_text("\n".join(lines))
    return str(root)


def test_librispeech_raw_loader(librispeech_dir):
    args = LibriSpeechDataLoaderArgs(
        data_dir=librispeech_dir, batch_size=2, audio_maxlen=12000, labels_maxlen=64
    )
    loader = LibriSpeechDataLoader(args)
    batches = list(loader(seed=None, drop_remainder=True))
    assert len(batches) == 2  # 4 matched samples (orphan discarded), batch 2
    assert len(loader) == 4
    tok = Wav2Vec2Processor(is_tokenizer=True)
    decoded = []
    for batch in batches:
        assert batch["speech"].shape == (2, 12000)
        assert batch["labels"].shape == (2, 64)
        assert batch["attention_mask"].shape == (2, 12000)
        for row in batch["labels"]:
            decoded.append(tok.decode(row, group_tokens=False))
    assert sorted(decoded) == sorted(TRANSCRIPTS)


def test_librispeech_normalisation(librispeech_dir):
    args = LibriSpeechDataLoaderArgs(
        data_dir=librispeech_dir, batch_size=4, audio_maxlen=12000
    )
    batch = next(iter(LibriSpeechDataLoader(args)(drop_remainder=True)))
    # valid region is zero-mean/unit-variance per sample
    # (`processor.py:101-106` semantics applied before padding)
    mask = batch["attention_mask"][0].astype(bool)
    valid = batch["speech"][0][mask]
    assert abs(valid.mean()) < 1e-3
    assert abs(valid.std() - 1.0) < 1e-2


def test_tfrecord_loader_and_sharding(librispeech_dir, tmp_path):
    # write shards from the raw dir, then read via the tfrecord path
    raw_args = LibriSpeechDataLoaderArgs(data_dir=librispeech_dir, batch_size=1)
    raw = LibriSpeechDataLoader(raw_args)
    shard_paths = [str(tmp_path / f"train-{i}.tfrecord") for i in range(2)]
    writers = [TFRecordWriter(p) for p in shard_paths]
    for i, (speech, label) in enumerate(raw._raw_samples()):
        writers[i % 2].write(speech, label)
    for w in writers:
        w.close()

    args = LibriSpeechDataLoaderArgs(
        from_tfrecords=True,
        tfrecords=shard_paths,
        batch_size=2,
        audio_maxlen=12000,
        labels_maxlen=64,
    )
    batches = list(LibriSpeechDataLoader(args)(drop_remainder=True))
    assert len(batches) == 2
    assert batches[0]["speech"].shape == (2, 12000)

    # per-host sharding: two hosts each see one shard file (2 samples)
    for host in range(2):
        host_loader = LibriSpeechDataLoader(args, shard_index=host, shard_count=2)
        host_batches = list(host_loader(drop_remainder=True))
        assert len(host_batches) == 1


def test_shuffle_actually_shuffles(librispeech_dir):
    """The reference's shuffle was a silent no-op (`data_utils.py:59-60`);
    ours must both shuffle and be seed-deterministic."""
    args = LibriSpeechDataLoaderArgs(
        data_dir=librispeech_dir, batch_size=1, audio_maxlen=12000, buffer_size=4
    )

    def label_order(seed):
        loader = LibriSpeechDataLoader(args)
        return [tuple(b["labels"][0][:8]) for b in loader(seed=seed)]

    assert label_order(3) == label_order(3)  # deterministic
    orders = {tuple(label_order(s)) for s in range(6)}
    assert len(orders) > 1  # actually permutes


@pytest.fixture(scope="module")
def timit_dir(tmp_path_factory):
    rng = np.random.default_rng(8)
    root = tmp_path_factory.mktemp("timit") / "TRAIN" / "DR1"
    root.mkdir(parents=True)
    for i, text in enumerate(TRANSCRIPTS[:2]):
        stem = root / f"S{i}"
        _write_wav(str(stem) + ".WAV", _signal(rng, 6000))
        # TIMIT transcript format: "<start> <end> <text>"
        with open(str(stem) + ".TXT", "w") as f:
            f.write(f"0 6000 {text}")
    # WAV without TXT is skipped
    _write_wav(str(root / "ORPHAN.WAV"), _signal(rng, 3000))
    return str(root.parent)


def test_timit_loader(timit_dir):
    args = TimitDataLoaderArgs(
        data_dir=timit_dir, batch_size=2, audio_maxlen=8000, labels_maxlen=64
    )
    batches = list(TimitDataLoader(args)(drop_remainder=True))
    assert len(batches) == 1
    batch = batches[0]
    assert batch["speech"].shape == (2, 8000)
    tok = Wav2Vec2Processor(is_tokenizer=True)
    decoded = sorted(tok.decode(r, group_tokens=False) for r in batch["labels"])
    assert decoded == sorted(TRANSCRIPTS[:2])


def test_make_tfrecords_cli(librispeech_dir, tmp_path):
    out_dir = str(tmp_path / "shards")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "gsoc_wav2vec2_tpu.cli.make_tfrecords",
            "--data_dir",
            librispeech_dir,
            "-d",
            out_dir,
            "-n",
            "2",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd="/root/repo",
    )
    assert result.returncode == 0, result.stderr
    shards = sorted(os.listdir(out_dir))
    assert len(shards) == 2
    total = sum(
        1 for p in shards for _ in read_tfrecords(os.path.join(out_dir, p))
    )
    assert total == 4
