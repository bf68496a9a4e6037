"""ctypes bindings for the native IO library (`native/w2v2io.cc`).

Replaces the reference's TF-runtime IO stack (tf.io.TFRecordWriter /
tf.data.TFRecordDataset parsing in `/root/reference/src/data_utils.py:17-27`
and `make_tfrecords.py:10-23`, soundfile FLAC reads at `data_utils.py:219-226`,
`tf.audio.decode_wav` at `:317-324`) with a dependency-free C++ library:
wire-compatible TFRecord+Example codec, RIFF PCM16 WAV and full FLAC
decoders.  The shared object is built on first use with `make` and cached
next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libw2v2io.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["make", "-C", _NATIVE_DIR],
        check=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        # W2V2IO_LIB: load a prebuilt library instead (the fuzz suite uses
        # this to run the decoders under an AddressSanitizer build)
        override = os.environ.get("W2V2IO_LIB")
        if override:
            so_path = override
        else:
            so_path = _SO_PATH
            src = os.path.join(_NATIVE_DIR, "w2v2io.cc")
            if not os.path.isfile(so_path) or (
                os.path.isfile(src)
                and os.path.getmtime(src) > os.path.getmtime(so_path)
            ):
                _build()
        lib = ctypes.CDLL(so_path)

        lib.w2v2_writer_open.restype = ctypes.c_void_p
        lib.w2v2_writer_open.argtypes = [ctypes.c_char_p]
        lib.w2v2_writer_write.restype = ctypes.c_int
        lib.w2v2_writer_write.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.w2v2_writer_close.argtypes = [ctypes.c_void_p]

        lib.w2v2_reader_open.restype = ctypes.c_void_p
        lib.w2v2_reader_open.argtypes = [ctypes.c_char_p]
        lib.w2v2_reader_open_buffer.restype = ctypes.c_void_p
        lib.w2v2_reader_open_buffer.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.w2v2_reader_next.restype = ctypes.c_int
        lib.w2v2_reader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.w2v2_reader_close.argtypes = [ctypes.c_void_p]

        for name in ("w2v2_decode_wav", "w2v2_decode_flac"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
        for name in ("w2v2_decode_wav_buffer", "w2v2_decode_flac_buffer"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
        lib.w2v2_free.argtypes = [ctypes.c_void_p]

        lib.w2v2_decode_flac_batch.restype = None
        lib.w2v2_decode_flac_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


class TFRecordWriter:
    """tf.io.TFRecordWriter-compatible writer for the reference's
    {"speech": float32, "label": int32} Example schema."""

    def __init__(self, path: str):
        self._lib = get_lib()
        self._handle = self._lib.w2v2_writer_open(path.encode())
        if not self._handle:
            raise OSError(f"cannot open {path} for writing")

    def write(self, speech: np.ndarray, label: np.ndarray) -> None:
        speech = np.ascontiguousarray(speech, np.float32)
        label = np.ascontiguousarray(label, np.int32)
        rc = self._lib.w2v2_writer_write(
            self._handle,
            speech.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            speech.size,
            label.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            label.size,
        )
        if rc != 0:
            raise OSError("tfrecord write failed")

    def close(self) -> None:
        if self._handle:
            self._lib.w2v2_writer_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_tfrecords(path: str) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (speech float32[T], label int32[U]) from a TFRecord shard.

    Wire- and schema-compatible with shards written by the reference's
    `make_tfrecords.py` (verified in tests against tf.io itself).
    """
    lib = get_lib()
    handle = lib.w2v2_reader_open(path.encode())
    if not handle:
        raise OSError(f"cannot open {path}")
    yield from _drain_reader(lib, handle, path)


def read_tfrecords_bytes(data: bytes, name: str = "<buffer>"):
    """`read_tfrecords` over an in-memory shard (e.g. fetched from gs://).

    The same native framing/proto parser runs over the buffer via
    `fmemopen`; `name` only labels error messages.
    """
    if not data:
        return
    lib = get_lib()
    # keep a reference so the buffer outlives the native reader
    handle = lib.w2v2_reader_open_buffer(data, len(data))
    if not handle:
        raise OSError(f"cannot open in-memory tfrecord {name}")
    yield from _drain_reader(lib, handle, name)


def _drain_reader(lib, handle, path: str) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    try:
        speech_p = ctypes.POINTER(ctypes.c_float)()
        label_p = ctypes.POINTER(ctypes.c_int32)()
        slen = ctypes.c_int64()
        llen = ctypes.c_int64()
        while True:
            rc = lib.w2v2_reader_next(
                handle,
                ctypes.byref(speech_p),
                ctypes.byref(slen),
                ctypes.byref(label_p),
                ctypes.byref(llen),
            )
            if rc == 0:
                return
            if rc < 0:
                raise OSError(f"corrupt tfrecord in {path}")
            speech = np.ctypeslib.as_array(speech_p, (slen.value,)).copy()
            label = np.ctypeslib.as_array(label_p, (llen.value,)).copy()
            yield speech, label
    finally:
        lib.w2v2_reader_close(handle)


def _decode(fn_name: str, path: str) -> Tuple[np.ndarray, int]:
    lib = get_lib()
    out = ctypes.POINTER(ctypes.c_float)()
    rate = ctypes.c_int()
    channels = ctypes.c_int()
    n = getattr(lib, fn_name)(
        path.encode(), ctypes.byref(out), ctypes.byref(rate), ctypes.byref(channels)
    )
    if n < 0:
        raise OSError(f"failed to decode {path}")
    audio = np.ctypeslib.as_array(out, (n,)).copy()
    lib.w2v2_free(out)
    return audio, rate.value


def _decode_buffer(fn_name: str, data: bytes, name: str) -> Tuple[np.ndarray, int]:
    lib = get_lib()
    out = ctypes.POINTER(ctypes.c_float)()
    rate = ctypes.c_int()
    channels = ctypes.c_int()
    n = getattr(lib, fn_name)(
        data, len(data), ctypes.byref(out), ctypes.byref(rate),
        ctypes.byref(channels),
    )
    if n < 0:
        raise OSError(f"failed to decode {name}")
    audio = np.ctypeslib.as_array(out, (n,)).copy()
    lib.w2v2_free(out)
    return audio, rate.value


def decode_wav_bytes(data: bytes, name: str = "<buffer>") -> Tuple[np.ndarray, int]:
    """`decode_wav` over in-memory bytes (remote-storage path)."""
    return _decode_buffer("w2v2_decode_wav_buffer", data, name)


def decode_flac_bytes(data: bytes, name: str = "<buffer>") -> Tuple[np.ndarray, int]:
    """`decode_flac` over in-memory bytes (remote-storage path)."""
    return _decode_buffer("w2v2_decode_flac_buffer", data, name)


def decode_wav(path: str) -> Tuple[np.ndarray, int]:
    """RIFF PCM16 -> (float32 in [-1, 1), sample_rate).

    Same scaling as `tf.audio.decode_wav` (x / 32768).
    """
    return _decode("w2v2_decode_wav", path)


def decode_flac(path: str) -> Tuple[np.ndarray, int]:
    """FLAC -> (float32 in [-1, 1), sample_rate), first channel.

    Same scaling as `soundfile.read` applies to PCM16 FLAC.
    """
    return _decode("w2v2_decode_flac", path)


def decode_flac_batch(
    paths, num_threads: int = 8
) -> list:
    """Decode many FLAC files concurrently in the native thread pool.

    Returns a list of (float32 audio, sample_rate) in input order; a failed
    file raises OSError naming it.  ctypes releases the GIL for the whole
    call, so Python-side prefetch threads run alongside.
    """
    lib = get_lib()
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_float) * n)()
    lens = (ctypes.c_int64 * n)()
    rates = (ctypes.c_int * n)()
    lib.w2v2_decode_flac_batch(c_paths, n, num_threads, outs, lens, rates)
    results = []
    try:
        for i in range(n):
            if lens[i] < 0:
                raise OSError(f"failed to decode {paths[i]}")
            audio = np.ctypeslib.as_array(outs[i], (lens[i],)).copy()
            results.append((audio, rates[i]))
    finally:
        for i in range(n):
            if lens[i] >= 0 and outs[i]:
                lib.w2v2_free(outs[i])
    return results


def read_sound(path: str) -> Tuple[np.ndarray, int]:
    """Dispatch on extension (.flac / .wav, case-insensitive)."""
    low = path.lower()
    if low.endswith(".flac"):
        return decode_flac(path)
    if low.endswith(".wav"):
        return decode_wav(path)
    raise ValueError(f"unsupported audio format: {path}")
