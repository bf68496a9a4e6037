"""Fuzz/robustness tests for the native C++ codec (`data/native/w2v2io.cc`).

The reference delegates decode robustness to TensorFlow/libsndfile; our
data plane is hand-written C++, so hostile bytes are OUR attack surface:
a serving daemon accepts WAV/FLAC uploads (`cli.serve`) and tfrecords may
arrive truncated from object storage.  Every decoder must fail with a
clean Python `OSError` (or return a sane prefix) on ANY input — never
segfault, abort (uncaught `bad_alloc` across the C ABI), or allocate
absurdly from attacker-controlled header fields.

All decodes run in ONE subprocess so a native crash fails the test with
the harness's progress marker instead of killing the pytest process.
"""

import os
import subprocess
import sys

import pytest

# slow tier: ~30k hostile inputs incl. exhaustive byte sweeps + ASAN rerun
pytestmark = pytest.mark.slow

HARNESS = r"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

from gsoc_wav2vec2_tpu.data import native_io
from flac_encoder import encode_flac

rng = np.random.default_rng(0)
checked = {"wav": 0, "flac": 0, "tfrecord": 0}


def expect_clean(fn, *args):
    # the decode either succeeds or raises OSError/ValueError; anything
    # else (or a native crash, which kills this process) is a bug
    try:
        fn(*args)
    except (OSError, ValueError):
        pass


def wav_bytes(n=8000):
    import io
    import wave

    pcm = (1000 * np.sin(np.arange(n) / 8.0)).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return bio.getvalue()


def mutations(blob, flips=300, truncations=50):
    blob = bytearray(blob)
    for _ in range(flips):
        m = bytearray(blob)
        for _ in range(int(rng.integers(1, 4))):
            m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
        yield bytes(m)
    for _ in range(truncations):
        yield bytes(blob[: int(rng.integers(0, len(blob)))])
    for _ in range(50):  # pure noise
        yield bytes(rng.integers(0, 256, size=int(rng.integers(0, 400)),
                                 dtype=np.uint8))


# --- WAV -------------------------------------------------------------------
valid = wav_bytes()
audio, rate = native_io.decode_wav_bytes(valid)
assert rate == 16000 and len(audio) == 8000
for m in mutations(valid):
    expect_clean(native_io.decode_wav_bytes, m)
    checked["wav"] += 1
# truncated right after a full-size fmt header (the OOB-read regression)
hdr = valid[:36]
expect_clean(native_io.decode_wav_bytes, hdr)
# fmt chunk declaring 16 bytes it does not have
expect_clean(native_io.decode_wav_bytes, valid[:20])
# data chunk declaring 4 GiB
big = bytearray(valid)
big[40:44] = (0xFFFFFFF0).to_bytes(4, "little")
expect_clean(native_io.decode_wav_bytes, bytes(big))
checked["wav"] += 3

# --- FLAC ------------------------------------------------------------------
sig = (rng.standard_normal(6000) * 3000).astype(np.int32)
valid = encode_flac(sig.astype(np.int16))
audio, rate = native_io.decode_flac_bytes(valid)
assert rate == 16000 and len(audio) == 6000
for m in mutations(valid):
    expect_clean(native_io.decode_flac_bytes, m)
    checked["flac"] += 1
# crafted STREAMINFO claiming 2^36-1 total samples: must not pre-allocate
# 256 GB (reserve clamp) and must fail/finish promptly
b = bytearray(valid)
# STREAMINFO layout: 4 sync + 4 block header + 2+2+3+3 = 18 bytes, then
# 20 bits rate + 3 bits ch + 5 bits bps + 36 bits total  => bytes 21..26
# hold [rate(20) ch(3) bps(5) total(36)]; force the 36-bit field to all-1s
b[25] |= 0x0F
b[26:30] = b"\xff\xff\xff\xff"
expect_clean(native_io.decode_flac_bytes, bytes(b))
checked["flac"] += 1

# exhaustive single-byte corruption sweeps on tiny inputs: EVERY position
# takes EVERY value — deterministic coverage of all one-byte mutations,
# including the FLAC subframe-type byte (an LPC order larger than a tiny
# blocksize once wrote warm-up samples out of bounds) and every WAV header
# field.  Run under ASAN (see test_native_codec_fuzz_under_asan) this
# catches silent heap corruption, not just crashes.
tiny_flac = bytearray(encode_flac(np.array([100, -200, 300, -400], np.int16)))
for pos in range(len(tiny_flac)):
    orig = tiny_flac[pos]
    for val in range(256):
        if val == orig:
            continue
        tiny_flac[pos] = val
        expect_clean(native_io.decode_flac_bytes, bytes(tiny_flac))
        checked["flac"] += 1
    tiny_flac[pos] = orig

tiny_wav = bytearray(wav_bytes(8))
for pos in range(len(tiny_wav)):
    orig = tiny_wav[pos]
    for val in range(256):
        if val == orig:
            continue
        tiny_wav[pos] = val
        expect_clean(native_io.decode_wav_bytes, bytes(tiny_wav))
        checked["wav"] += 1
    tiny_wav[pos] = orig

# batch decode (the C++ thread pool): hostile and valid files mixed in one
# call — per-file failures must surface as OSError without poisoning the
# pool or the other decodes
import tempfile

tmp = tempfile.mkdtemp()
good = encode_flac((rng.standard_normal(500) * 1000).astype(np.int16))
paths = []
for i in range(12):
    p = f"{tmp}/batch{i}.flac"
    if i % 3 == 0:
        blob = good
    elif i % 3 == 1:
        blob = bytes(good[: int(rng.integers(0, len(good)))])  # truncated
    else:
        m = bytearray(good)
        m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
        blob = bytes(m)
    open(p, "wb").write(blob)
    paths.append(p)
try:
    decoded = native_io.decode_flac_batch(paths)
    for (audio, rate), p in zip(decoded, paths):
        assert len(audio) >= 0 and rate >= 0
except OSError:
    pass  # a failed member surfaces per-call; either behavior is clean
# the valid files alone must decode through the pool
ok = native_io.decode_flac_batch([f"{tmp}/batch0.flac", f"{tmp}/batch3.flac"])
assert all(len(a) == 500 and r == 16000 for a, r in ok)
checked["flac"] += 12

# --- TFRecord --------------------------------------------------------------
path = f"{tmp}/fuzz.tfrecord"
with native_io.TFRecordWriter(path) as w:
    for i in range(4):
        w.write(
            np.arange(100 + i, dtype=np.float32),
            np.arange(5 + i, dtype=np.int32),
        )
valid = open(path, "rb").read()
records = list(native_io.read_tfrecords_bytes(valid))
assert len(records) == 4


def read_all(blob):
    return list(native_io.read_tfrecords_bytes(blob))


# every truncation point: clean prefix or OSError, never more records
for cut in range(0, len(valid), 7):
    try:
        got = read_all(valid[:cut])
        assert len(got) <= 4
    except (OSError, ValueError):
        pass
    checked["tfrecord"] += 1
for m in mutations(valid, flips=200, truncations=0):
    expect_clean(read_all, m)
    checked["tfrecord"] += 1

# crafted record: CRC-VALID 8 GiB length header (passes the length CRC, so
# only the allocation guard stands between it and an abort)
CRC_TABLE = []
for i in range(256):
    c = i
    for _ in range(8):
        c = (0x82F63B78 ^ (c >> 1)) if (c & 1) else (c >> 1)
    CRC_TABLE.append(c)


def masked_crc(data):
    c = 0xFFFFFFFF
    for byte in data:
        c = CRC_TABLE[(c ^ byte) & 0xFF] ^ (c >> 8)
    c ^= 0xFFFFFFFF
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


length = (8 << 30).to_bytes(8, "little")
crafted = length + masked_crc(length).to_bytes(4, "little") + b"\x00" * 64
expect_clean(read_all, crafted)
checked["tfrecord"] += 1

print(f"FUZZ_OK {checked}")
"""


def _run_harness(extra_env=None, timeout=600):
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/repo/tests")
    env.update(extra_env or {})
    result = subprocess.run(
        [sys.executable, "-c", HARNESS],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=timeout,
    )
    assert result.returncode == 0, (
        f"native codec crashed or mis-errored during fuzzing:\n"
        f"stdout: {result.stdout[-2000:]}\nstderr: {result.stderr[-3000:]}"
    )
    assert "FUZZ_OK" in result.stdout
    import ast

    counts = ast.literal_eval(result.stdout.split("FUZZ_OK ")[1].strip())
    # tens of thousands of hostile inputs actually ran (random mutations +
    # the exhaustive single-byte sweeps)
    assert counts["wav"] >= 10_000
    assert counts["flac"] >= 10_000
    assert counts["tfrecord"] >= 300
    return result


def test_native_codec_survives_hostile_bytes():
    _run_harness()


def test_native_codec_fuzz_under_asan(tmp_path):
    """The same fuzz corpus against an AddressSanitizer build of the codec:
    silent heap overreads/overwrites (which a plain run survives by luck)
    become hard failures.  Skipped when the toolchain lacks ASAN."""
    import shutil
    import subprocess as sp

    import pytest

    src = "/root/repo/gsoc_wav2vec2_tpu/data/native/w2v2io.cc"
    asan_so = str(tmp_path / "libw2v2io_asan.so")
    build = sp.run(
        ["g++", "-O1", "-g", "-fPIC", "-shared", "-fsanitize=address",
         "-std=c++17", "-o", asan_so, src],
        capture_output=True, text=True,
    )
    if build.returncode != 0:
        pytest.skip(f"no ASAN toolchain: {build.stderr[-300:]}")
    runtime = sp.run(
        ["gcc", "-print-file-name=libasan.so"], capture_output=True, text=True
    ).stdout.strip()
    if not runtime or not os.path.isfile(runtime):
        pytest.skip("libasan runtime not found")

    result = _run_harness(
        extra_env={
            "W2V2IO_LIB": asan_so,
            "LD_PRELOAD": runtime,
            # python leaks by design; halt_on_error stays on for real bugs
            "ASAN_OPTIONS": "detect_leaks=0",
        },
        timeout=600,
    )
    assert "AddressSanitizer" not in result.stderr
