"""FLAC decoder tests against an independent reference encoder (MSB
bit writer, spec-forward Rice/fixed/LPC coding). FLAC is lossless, so
sample round-trips are EXACT."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tantivy4java_ray.stages.flac import decode_flac
from tantivy4java_ray.stages.multimodal import (AudioFrameSample,
                                                decode_flac_energies)


class _MSBW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def put_signed(self, val: int, nbits: int) -> None:
        self.put(val & ((1 << nbits) - 1), nbits)

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.put(0, 1)
        self.put(1, 1)

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _rice(w: _MSBW, residuals, param: int, raw_bits: int | None = None):
    """One partition: escape to raw bits when requested."""
    if raw_bits is not None:
        w.put((1 << 4) - 1, 4)              # escape (method-0 4-bit)
        w.put(raw_bits, 5)
        for r in residuals:
            if raw_bits:
                w.put_signed(int(r), raw_bits)
        return
    w.put(param, 4)
    for r in residuals:
        r = int(r)
        u = (r << 1) ^ (r >> 63) if r < 0 else (r << 1)
        u = ((-r << 1) - 1) if r < 0 else (r << 1)
        w.unary(u >> param)
        if param:
            w.put(u & ((1 << param) - 1), param)


def _subframe_verbatim(w: _MSBW, x, bps):
    w.put(0, 1)
    w.put(1, 6)
    w.put(0, 1)                              # no wasted bits
    for v in x:
        w.put_signed(int(v), bps)


def _subframe_constant(w: _MSBW, v, bps):
    w.put(0, 1)
    w.put(0, 6)
    w.put(0, 1)
    w.put_signed(int(v), bps)


def _subframe_fixed(w: _MSBW, x, bps, order, porder=0,
                    param=4, raw_bits=None, wasted=0):
    w.put(0, 1)
    w.put(8 + order, 6)
    if wasted:
        w.put(1, 1)
        w.unary(wasted - 1)
        xs = [int(v) >> wasted for v in x]
    else:
        w.put(0, 1)
        xs = [int(v) for v in x]
    eff = bps - wasted
    for i in range(order):
        w.put_signed(xs[i], eff)
    coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
             4: [4, -6, 4, -1]}[order]
    res = []
    for i in range(order, len(xs)):
        pred = sum(c * xs[i - 1 - j] for j, c in enumerate(coefs))
        res.append(xs[i] - pred)
    w.put(0, 2)                              # method 0 (4-bit rice)
    w.put(porder, 4)
    nparts = 1 << porder
    blocksize = len(xs)
    pos = 0
    for p in range(nparts):
        count = blocksize // nparts - (order if p == 0 else 0)
        _rice(w, res[pos:pos + count], param, raw_bits)
        pos += count


def _subframe_lpc(w: _MSBW, x, bps, coefs, shift, prec, param=4):
    order = len(coefs)
    w.put(0, 1)
    w.put(32 + order - 1, 6)
    w.put(0, 1)
    xs = [int(v) for v in x]
    for i in range(order):
        w.put_signed(xs[i], bps)
    w.put(prec - 1, 4)
    w.put_signed(shift, 5)
    for c in coefs:
        w.put_signed(c, prec)
    res = []
    for i in range(order, len(xs)):
        acc = sum(coefs[j] * xs[i - 1 - j] for j in range(order))
        res.append(xs[i] - (acc >> shift))
    w.put(0, 2)
    w.put(0, 4)
    _rice(w, res, param)


def encode_flac(channels, *, bps=16, rate=16000, blocksize=64,
                subframe="fixed2", stereo_mode=None, porder=0,
                raw_bits=None, wasted=0):
    """channels: list of int sample arrays (1 or 2). One or more frames
    of ``blocksize`` (last may be shorter)."""
    nch = len(channels)
    total = len(channels[0])
    # STREAMINFO
    si = _MSBW()
    si.put(blocksize, 16)
    si.put(blocksize, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(nch - 1, 3)
    si.put(bps - 1, 5)
    si.put(total, 36)
    si.put(0, 128)                           # md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + si.bytes()

    def emit_sub(w, x, eff_bps):
        if subframe == "verbatim":
            _subframe_verbatim(w, x, eff_bps)
        elif subframe == "constant":
            _subframe_constant(w, x[0], eff_bps)
        elif subframe.startswith("fixed"):
            _subframe_fixed(w, x, eff_bps, int(subframe[5:]),
                            porder=porder, raw_bits=raw_bits,
                            wasted=wasted)
        else:                                # lpc
            _subframe_lpc(w, x, eff_bps, coefs=[50, -20, 3],
                          shift=5, prec=8)

    frame_no = 0
    for start in range(0, total, blocksize):
        bs = min(blocksize, total - start)
        w = _MSBW()
        w.put(0x3FFE, 14)
        w.put(0, 1)
        w.put(0, 1)
        w.put(7, 4)                          # blocksize: 16-bit follows
        w.put(0, 4)                          # rate from STREAMINFO
        if stereo_mode is None:
            w.put(nch - 1, 4)
        else:
            w.put({"left": 8, "right": 9, "mid": 10}[stereo_mode], 4)
        w.put({8: 1, 12: 3, 16: 4, 20: 5, 24: 6}[bps], 3)
        w.put(0, 1)
        assert frame_no < 128
        w.put(frame_no, 8)                   # UTF-8 single byte
        w.put(bs - 1, 16)
        w.put(0, 8)                          # header CRC (unverified)
        if stereo_mode is None:
            for ch in channels:
                emit_sub(w, ch[start:start + bs], bps)
        else:
            L = np.asarray(channels[0][start:start + bs], np.int64)
            R = np.asarray(channels[1][start:start + bs], np.int64)
            side = L - R
            if stereo_mode == "left":
                emit_sub(w, L, bps)
                emit_sub(w, side, bps + 1)
            elif stereo_mode == "right":
                emit_sub(w, side, bps + 1)
                emit_sub(w, R, bps)
            else:
                mid = (L + R) >> 1
                emit_sub(w, mid, bps)
                emit_sub(w, side, bps + 1)
        w.align()
        w.put(0, 16)                         # frame CRC (unverified)
        out += w.bytes()
        frame_no += 1
    return bytes(out)


def _mono(*chans):
    return np.mean(np.stack([np.asarray(c, np.float64)
                             for c in chans]), axis=0) / 32768.0


@pytest.mark.parametrize("sub", ["constant", "verbatim", "fixed0",
                                 "fixed1", "fixed2", "fixed3", "fixed4",
                                 "lpc"])
def test_mono_roundtrip_each_subframe(sub):
    rng = np.random.default_rng(hash(sub) % 1000)
    if sub == "constant":
        x = np.full(200, -1234, np.int64)
    else:
        # smooth-ish signal keeps residuals small (any size works; the
        # rice coder just gets longer)
        x = (2000 * np.sin(np.arange(200) / 7)
             + rng.integers(-50, 50, 200)).astype(np.int64)
    payload = encode_flac([x], subframe=sub, blocksize=64)
    samples, rate = decode_flac(payload)
    assert rate == 16000
    np.testing.assert_allclose(samples, x / 32768.0, atol=1e-12)


@pytest.mark.parametrize("mode", ["left", "right", "mid", None])
def test_stereo_decorrelation(mode):
    rng = np.random.default_rng(5)
    L = (1000 * np.sin(np.arange(130) / 5)).astype(np.int64)
    R = (900 * np.cos(np.arange(130) / 9) + rng.integers(-9, 9, 130)
         ).astype(np.int64)
    payload = encode_flac([L, R], subframe="fixed2", blocksize=64,
                          stereo_mode=mode)
    samples, _ = decode_flac(payload)
    np.testing.assert_allclose(samples, _mono(L, R), atol=1e-12)


def test_partitions_escape_and_wasted_bits():
    x = (np.arange(128) * 8).astype(np.int64)     # 3 wasted low bits
    p = encode_flac([x], subframe="fixed1", blocksize=128, porder=2)
    np.testing.assert_allclose(decode_flac(p)[0], x / 32768.0,
                               atol=1e-12)
    p = encode_flac([x], subframe="fixed1", blocksize=128,
                    raw_bits=14)
    np.testing.assert_allclose(decode_flac(p)[0], x / 32768.0,
                               atol=1e-12)
    p = encode_flac([x], subframe="fixed1", blocksize=128, wasted=3)
    np.testing.assert_allclose(decode_flac(p)[0], x / 32768.0,
                               atol=1e-12)


def test_rejections():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"OggS....")
    x = np.zeros(64, np.int64)
    good = encode_flac([x])
    with pytest.raises(ValueError):
        decode_flac(good[:30])
    bad = bytearray(good)
    bad[50] ^= 0xFF                          # corrupt a frame byte
    try:
        decode_flac(bytes(bad))
    except ValueError:
        pass                                 # fail-closed is fine too


def test_audio_stage_flac_end_to_end(ray_session):
    import ray.data
    x = (8000 * np.sin(np.arange(1600) / 20)).astype(np.int64)
    payload = encode_flac([x], blocksize=256)
    df = pd.DataFrame({"doc_id": np.asarray([0], np.int64),
                       "audio": [payload]})
    out = (ray.data.from_arrow(pa.Table.from_pandas(df))
           .map_batches(AudioFrameSample,
                        fn_constructor_kwargs=dict(n_frames=8),
                        batch_size=1, concurrency=1,
                        batch_format="pyarrow")
           .to_pandas())
    e = np.asarray(out["frame_energy"].iloc[0], np.float32)
    assert e.shape == (8,)
    # constant-amplitude sine: RMS ~ A/sqrt(2) in every frame
    np.testing.assert_allclose(e, (8000 / 32768) / np.sqrt(2),
                               rtol=0.05)
    # direct energies helper agrees
    e2 = decode_flac_energies(payload, 8)
    np.testing.assert_allclose(e, e2, atol=1e-7)
