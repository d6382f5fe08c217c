"""FLAC decoder — pure stdlib + numpy, no codec library. Speech
corpora (LibriSpeech, MLS, people's-speech-style crawls) ship FLAC, so
the audio stage needs it natively; MP3/OGG remain the honest raise
(psychoacoustic codecs are library territory).

Implements the public FLAC format (RFC 9639): metadata blocks
(STREAMINFO), frame headers with UTF-8-coded frame numbers and
blocksize/rate escapes, subframes — CONSTANT, VERBATIM, FIXED orders
0-4 and LPC up to order 32 with signed quantized coefficients — Rice /
Rice2 partitioned residuals incl. the raw-bits escape, wasted-bits
unary, and stereo decorrelation (left/side, right/side, mid/side).
Frame CRCs are not verified (corrupt payloads still fail closed via
structural checks).

Decoding is sample-serial where the format is (Rice quotients are
unary); FIXED-order residual integration and channel decorrelation run
vectorized per frame (k repeated np.cumsum seeded from the warmup
difference triangle); the LPC recurrence is a genuine IIR and loops
over the frame only.
"""

from __future__ import annotations

import numpy as np


class _MSBBits:
    """MSB-first bit reader (FLAC bit order)."""

    __slots__ = ("d", "bitpos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.d = data
        self.bitpos = bitpos

    def read(self, n: int) -> int:
        d = self.d
        p = self.bitpos
        if p + n > 8 * len(d):
            raise ValueError("truncated FLAC stream")
        v = 0
        # byte-at-a-time fill
        while n > 0:
            byte = d[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, n)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            p += take
            n -= take
        self.bitpos = p
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway FLAC unary code")
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _read_utf8_number(br: _MSBBits) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("invalid FLAC frame-number coding")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("invalid FLAC frame-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}

_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}

_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def _residuals(br: _MSBBits, blocksize: int, pred_order: int
               ) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition count does not divide blocksize")
    if nparts > 1 and blocksize // nparts <= pred_order:
        # RFC 9639: blocksize >> porder must exceed the predictor order
        raise ValueError("FLAC partition size <= predictor order")
    out = np.empty(blocksize - pred_order, np.int64)
    pos = 0
    for p in range(nparts):
        count = blocksize // nparts - (pred_order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC partition smaller than order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(count):
                out[pos + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(count):
                q = br.unary()
                u = (q << param) | br.read(param)
                out[pos + i] = (u >> 1) ^ -(u & 1)   # unzigzag
        pos += count
    return out


def _subframe(br: _MSBBits, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("invalid FLAC subframe padding bit")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if ftype == 0:                            # CONSTANT
        v = br.read_signed(eff)
        out = np.full(blocksize, v, np.int64)
    elif ftype == 1:                          # VERBATIM
        out = np.array([br.read_signed(eff) for _ in range(blocksize)],
                       np.int64)
    elif 8 <= ftype <= 12:                    # FIXED order 0-4
        order = ftype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _residuals(br, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        # a FIXED predictor of order k makes the residual the k-th
        # DIFFERENCE of the signal, so integration is k repeated
        # cumsums seeded from the warmup's difference triangle —
        # fully vectorized (the LPC path below is a genuine IIR and
        # stays a loop)
        tri = np.asarray(warm, np.int64)
        heads = []
        for _j in range(order):
            heads.append(int(tri[-1]))       # D^j y at index order-1
            tri = np.diff(tri)
        seq = res
        for j in range(order - 1, -1, -1):
            seq = heads[j] + np.cumsum(seq)
        out[order:] = seq
    elif ftype >= 32:                         # LPC
        order = ftype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _residuals(br, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(out[i - 1 - j])
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return out << wasted


def decode_flac(payload: bytes):
    """-> (samples float64 in [-1, 1] mono-mixed, sample_rate). Multi-
    channel audio is averaged to mono (the frame-energy stage's input
    contract, same as the WAV path)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    try:
        return _decode_flac(payload)
    except IndexError:
        raise ValueError("truncated FLAC stream") from None


def _decode_flac(payload: bytes):
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        ln = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        if btype == 0:                        # STREAMINFO
            if len(body) < 18:
                raise ValueError("short FLAC STREAMINFO")
            br = _MSBBits(body)
            br.read(16)                       # min blocksize
            br.read(16)                       # max blocksize
            br.read(24)
            br.read(24)
            rate = br.read(20)
            nch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            streaminfo = (rate, nch, bps, total)
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, nch, bps, total = streaminfo
    if rate == 0:
        raise ValueError("invalid FLAC sample rate")
    br = _MSBBits(payload, pos * 8)
    chunks = []
    got = 0
    end = 8 * len(payload)
    while br.bitpos + 15 < end and (total == 0 or got < total):
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        br.read(1)                            # reserved
        br.read(1)                            # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)                            # reserved
        _read_utf8_number(br)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        elif bs_code in _BLOCKSIZES:
            blocksize = _BLOCKSIZES[bs_code]
        else:
            raise ValueError("reserved FLAC blocksize code")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample-rate code")
        bps_f = bps if ss_code == 0 else \
            {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
        if bps_f is None:
            raise ValueError("reserved FLAC sample-size code")
        br.read(8)                            # header CRC-8 (unverified)
        if ch_code < 8:
            n = ch_code + 1
            chans = [_subframe(br, blocksize, bps_f) for _ in range(n)]
        elif ch_code == 8:                    # left/side
            left = _subframe(br, blocksize, bps_f)
            side = _subframe(br, blocksize, bps_f + 1)
            chans = [left, left - side]
        elif ch_code == 9:                    # right/side
            side = _subframe(br, blocksize, bps_f + 1)
            right = _subframe(br, blocksize, bps_f)
            chans = [right + side, right]
        elif ch_code == 10:                   # mid/side
            mid = _subframe(br, blocksize, bps_f)
            side = _subframe(br, blocksize, bps_f + 1)
            left = ((mid << 1) | (side & 1)) + side
            chans = [left >> 1, (left - (side << 1)) >> 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        br.align()
        br.read(16)                           # frame CRC-16 (unverified)
        mono = np.mean(np.stack(chans), axis=0)
        chunks.append(mono)
        got += blocksize
    if not chunks:
        raise ValueError("FLAC stream has no frames")
    samples = np.concatenate(chunks)
    if total:
        samples = samples[:total]
    return samples / float(1 << (bps - 1)), rate
