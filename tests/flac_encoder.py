"""Minimal FLAC *encoder* — test fixture generator only.

There is no FLAC tooling in this image, so decoder tests synthesise their
own streams.  Supports constant / verbatim / fixed / LPC subframes, Rice
residuals (incl. the escape code), multi-partition residuals, and the four
stereo channel assignments — enough to exercise every branch of the native
decoder (`gsoc_wav2vec2_tpu/data/native/w2v2io.cc`).

Not a production encoder: CRC-8/CRC-16 are emitted correctly (the spec is
cheap to implement) but compression choices are caller-specified.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        assert n >= 0 and (n == 0 or value < (1 << n)) and value >= 0
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.nbits:
            self.write(0, 1)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(bw: BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # multi-byte form
    for nbytes in range(2, 8):
        if v < (1 << (5 * nbytes + 1)):
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF | (v >> (6 * (nbytes - 1)))
    bw.write(lead & 0xFF, 8)
    for i in range(nbytes - 2, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _rice_encode(bw: BitWriter, residuals, param: int, escape_bits=None) -> None:
    if escape_bits is not None:
        # escape code: param all-ones, then 5-bit raw size
        bw.write(0b1111, 4)
        bw.write(escape_bits, 5)
        for r in residuals:
            bw.write_signed(int(r), escape_bits)
        return
    bw.write(param, 4)
    for r in residuals:
        r = int(r)
        u = (r << 1) if r >= 0 else ((-r - 1 << 1) | 1)
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _encode_subframe(bw: BitWriter, sig, bps: int, kind: str, *,
                     order: int = 2, rice_param: int = 6,
                     partition_order: int = 0, escape_bits=None,
                     lpc_coefs=None, lpc_shift: int = 0,
                     lpc_precision: int = 12) -> None:
    sig = [int(x) for x in sig]
    n = len(sig)
    bw.write(0, 1)  # padding
    if kind == "constant":
        assert all(x == sig[0] for x in sig)
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(sig[0], bps)
        return
    if kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for x in sig:
            bw.write_signed(x, bps)
        return
    if kind == "fixed":
        bw.write(8 + order, 6)
        bw.write(0, 1)
        coefs = FIXED_COEFS[order]
        shift = 0
    elif kind == "lpc":
        bw.write(32 + (order - 1), 6)
        bw.write(0, 1)
        coefs = lpc_coefs
        shift = lpc_shift
    else:
        raise ValueError(kind)

    for x in sig[:order]:  # warm-up
        bw.write_signed(x, bps)
    if kind == "lpc":
        bw.write(lpc_precision - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in coefs:
            bw.write_signed(int(c), lpc_precision)

    residuals = []
    for i in range(order, n):
        pred = sum(int(coefs[j]) * sig[i - 1 - j] for j in range(order))
        residuals.append(sig[i] - (pred >> shift))

    # residual coding method 0 (4-bit rice params)
    bw.write(0, 2)
    bw.write(partition_order, 4)
    partitions = 1 << partition_order
    assert n % partitions == 0
    per_part = n >> partition_order
    idx = 0
    for part in range(partitions):
        count = per_part - (order if part == 0 else 0)
        _rice_encode(bw, residuals[idx: idx + count], rice_param, escape_bits)
        idx += count


def encode_flac(signal: np.ndarray, sample_rate: int = 16000, bps: int = 16,
                blocksize: int = 4096, subframe_kind: str = "verbatim",
                channel_assignment: str = "independent", **subframe_kw) -> bytes:
    """Encode int PCM (shape (N,) mono or (N, 2) stereo) into a FLAC stream."""
    signal = np.asarray(signal, np.int64)
    stereo = signal.ndim == 2
    n = signal.shape[0]
    channels = 2 if stereo else 1

    out = bytearray(b"fLaC")
    # STREAMINFO (type 0, last metadata block), 34 bytes
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 unset
    body = si.getvalue()
    out += bytes([0x80 | 0x00]) + len(body).to_bytes(3, "big") + body

    frame_index = 0
    pos = 0
    while pos < n:
        bs = min(blocksize, n - pos)
        block = signal[pos: pos + bs]
        bw = BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed-blocksize stream
        bw.write(7, 4)  # blocksize: 16-bit at end
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if not stereo:
            bw.write(0, 4)  # 1 channel, independent
        elif channel_assignment == "independent":
            bw.write(1, 4)
        elif channel_assignment == "left_side":
            bw.write(8, 4)
        elif channel_assignment == "right_side":
            bw.write(9, 4)
        elif channel_assignment == "mid_side":
            bw.write(10, 4)
        else:
            raise ValueError(channel_assignment)
        bw.write(0, 3)  # bps: from STREAMINFO
        bw.write(0, 1)  # reserved
        _utf8_number(bw, frame_index)
        bw.write(bs - 1, 16)
        bw.align()
        header = bw.getvalue()
        bw2 = BitWriter()
        for b in header:
            bw2.write(b, 8)
        bw2.write(crc8(header), 8)

        if not stereo:
            _encode_subframe(bw2, block, bps, subframe_kind, **subframe_kw)
        else:
            left = block[:, 0].astype(np.int64)
            right = block[:, 1].astype(np.int64)
            if channel_assignment == "independent":
                chans = [(left, bps), (right, bps)]
            elif channel_assignment == "left_side":
                chans = [(left, bps), (left - right, bps + 1)]
            elif channel_assignment == "right_side":
                chans = [(left - right, bps + 1), (right, bps)]
            else:  # mid_side
                side = left - right
                mid = (left + right) >> 1
                chans = [(mid, bps), (side, bps + 1)]
            for sig, ch_bps in chans:
                _encode_subframe(bw2, sig, ch_bps, subframe_kind, **subframe_kw)
        bw2.align()
        frame = bw2.getvalue()
        bw3 = BitWriter()
        for b in frame:
            bw3.write(b, 8)
        bw3.write(crc16(frame), 16)
        out += bw3.getvalue()

        pos += bs
        frame_index += 1

    return bytes(out)
