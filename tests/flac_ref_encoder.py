"""Minimal reference FLAC *encoder* used to build test vectors for the native
C++ decoder (voicebox_tpu/native/flacio.cpp).

Written independently from the decoder, straight from the FLAC spec
(RFC 9639), so a round-trip (encode here -> decode in C++) cross-checks two
separate implementations of the bitstream: container + STREAMINFO, frame
headers with CRC-8/CRC-16, CONSTANT / VERBATIM / FIXED / LPC subframes,
Rice & Rice2 residual partitions (with raw-bits escapes), wasted-bits-free
encoding, and independent / left-side / right-side / mid-side channel modes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["write_flac"]


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        assert nbits >= 0
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def tobytes(self) -> bytes:
        assert self.nbits == 0, "unaligned"
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
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 - nbytes + 6 * (nbytes - 1):
        nbytes += 1
    lead_bits = 7 - nbytes
    out.append((0xFF ^ ((1 << (lead_bits + 1)) - 1)) | (n >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _zigzag(v: int) -> int:
    return 2 * v if v >= 0 else -2 * v - 1


def _write_residual(bw: BitWriter, res, block_size, pred_order,
                    partition_order=0, rice_method=0, escape_partitions=()):
    """res: residuals for samples [pred_order, block_size)."""
    bw.write(rice_method, 2)
    bw.write(partition_order, 4)
    partitions = 1 << partition_order
    assert block_size % partitions == 0
    psize = block_size >> partition_order
    pbits = 4 if rice_method == 0 else 5
    escape_code = (1 << pbits) - 1
    idx = 0
    for p in range(partitions):
        count = psize - (pred_order if p == 0 else 0)
        part = res[idx:idx + count]
        idx += count
        if p in escape_partitions:
            raw = max((int(v).bit_length() + 1 for v in part), default=4)
            raw = min(max(raw, 3), 31)
            bw.write(escape_code, pbits)
            bw.write(raw, 5)
            for v in part:
                bw.write_signed(int(v), raw)
            continue
        mean = float(np.mean(np.abs(part))) if len(part) else 0.0
        param = 0
        while (1 << param) < mean + 1 and param < escape_code - 1:
            param += 1
        bw.write(param, pbits)
        for v in part:
            u = _zigzag(int(v))
            q, r = u >> param, u & ((1 << param) - 1)
            assert q < (1 << 20), "pick a bigger rice param for this signal"
            bw.write_unary(q)
            bw.write(r, param)
    assert idx == len(res)


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(bw: BitWriter, x, bps, mode, partition_order=0,
                    rice_method=0, escape_partitions=(),
                    lpc_coefs=None, lpc_shift=10, lpc_precision=12):
    x = [int(v) for v in x]
    n = len(x)
    bw.write(0, 1)  # pad
    if mode == "constant":
        assert all(v == x[0] for v in x)
        bw.write(0x00, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(x[0], bps)
    elif mode == "verbatim":
        bw.write(0x01, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(v, bps)
    elif mode.startswith("fixed"):
        order = int(mode[len("fixed"):])
        bw.write(0x08 | order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(v, bps)
        coefs = _FIXED_COEFS[order]
        res = [x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
               for i in range(order, n)]
        _write_residual(bw, res, n, order, partition_order, rice_method,
                        escape_partitions)
    elif mode == "lpc":
        coefs = lpc_coefs
        order = len(coefs)
        bw.write(0x20 | (order - 1), 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(v, bps)
        bw.write(lpc_precision - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in coefs:
            bw.write_signed(int(c), lpc_precision)
        res = [x[i] - (sum(int(c) * x[i - 1 - j]
                           for j, c in enumerate(coefs)) >> lpc_shift)
               for i in range(order, n)]
        _write_residual(bw, res, n, order, partition_order, rice_method,
                        escape_partitions)
    else:
        raise ValueError(mode)


_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def write_flac(path, channels, sample_rate, bps=16, block_size=4096,
               mode="fixed2", channel_mode="independent",
               partition_order=0, rice_method=0, escape_partitions=(),
               lpc_coefs=None, lpc_shift=10, lpc_precision=12,
               declare_total=True, ss_from_streaminfo=False):
    """channels: (n_channels, n_samples) int array of raw PCM."""
    channels = np.asarray(channels, dtype=np.int64)
    nch, total = channels.shape
    if channel_mode != "independent":
        assert nch == 2

    bw = BitWriter()
    bw.write(int.from_bytes(b"fLaC", "big"), 32)
    # STREAMINFO (last metadata block)
    bw.write(1, 1)
    bw.write(0, 7)
    bw.write(34, 24)
    bw.write(max(block_size, 16), 16)
    bw.write(max(block_size, 16), 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(nch - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total if declare_total else 0, 36)
    for _ in range(16):
        bw.write(0, 8)  # md5 (unverified)

    for frame_no, start in enumerate(range(0, total, block_size)):
        blk = channels[:, start:start + block_size]
        n = blk.shape[1]
        fw = BitWriter()
        fw.write(0x3FFE, 14)  # sync
        fw.write(0, 1)        # reserved
        fw.write(0, 1)        # fixed blocking
        fw.write(0x7, 4)      # block size: 16-bit at end
        fw.write(0, 4)        # sample rate: from STREAMINFO
        if channel_mode == "independent":
            ch_code = nch - 1
        else:
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[channel_mode]
        fw.write(ch_code, 4)
        fw.write(0 if ss_from_streaminfo else _SS_CODE[bps], 3)
        fw.write(0, 1)        # reserved
        for b in utf8_number(frame_no):
            fw.write(b, 8)
        fw.write(n - 1, 16)
        fw.write(crc8(bytes(fw.bytes)), 8)

        sub_kw = dict(partition_order=partition_order,
                      rice_method=rice_method,
                      escape_partitions=escape_partitions,
                      lpc_coefs=lpc_coefs, lpc_shift=lpc_shift,
                      lpc_precision=lpc_precision)
        if channel_mode == "independent":
            for c in range(nch):
                _write_subframe(fw, blk[c], bps, mode, **sub_kw)
        else:
            left, right = blk[0], blk[1]
            side = left - right
            if channel_mode == "left_side":
                _write_subframe(fw, left, bps, mode, **sub_kw)
                _write_subframe(fw, side, bps + 1, mode, **sub_kw)
            elif channel_mode == "right_side":
                _write_subframe(fw, side, bps + 1, mode, **sub_kw)
                _write_subframe(fw, right, bps, mode, **sub_kw)
            else:  # mid_side
                mid = (left + right) >> 1
                _write_subframe(fw, mid, bps, mode, **sub_kw)
                _write_subframe(fw, side, bps + 1, mode, **sub_kw)
        fw.align()
        fw.write(crc16(bytes(fw.bytes)), 16)
        for b in fw.tobytes():
            bw.write(b, 8)

    with open(path, "wb") as f:
        f.write(bw.tobytes())
    return path
