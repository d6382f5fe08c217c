"""Baseline JPEG decoder tests against an independent reference encoder.

The encoder (scalar, spec-literal) writes real JFIF streams with its own
uniform-length Huffman tables (valid canonical tables the decoder must
read from DHT — nothing is shared with the decoder). Two test layers:

1. EXACT: the entropy layer is lossless, so the encoder's quantized
   coefficient blocks must round-trip bit-for-bit through
   ``decode_jpeg_coeffs`` — Huffman, EXTEND, run-lengths, restart
   markers, byte stuffing all pinned exactly.
2. TOLERANCE: full decode of smooth/constant images lands within the
   quantization error bound of the original pixels.
"""

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tantivy4java_ray.stages.jpeg import (ZIGZAG, _C, decode_jpeg,
                                          decode_jpeg_coeffs)

# --- reference encoder ----------------------------------------------------

# uniform-length canonical Huffman tables (T.81-valid: fixed 8-bit codes,
# all-ones code unused). DC: symbols 0..11. AC: EOB, ZRL, and every
# (run 0..15, size 1..10) pair = 162 symbols.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]
_DC_COUNTS = [0] * 16
_DC_COUNTS[7] = len(_DC_SYMS)
_AC_COUNTS = [0] * 16
_AC_COUNTS[7] = len(_AC_SYMS)
_DC_CODE = {s: i for i, s in enumerate(_DC_SYMS)}
_AC_CODE = {s: i for i, s in enumerate(_AC_SYMS)}

_QLUM = np.full(64, 8, np.int32)
_QLUM[0] = 4
_QCHR = np.full(64, 12, np.int32)
_QCHR[0] = 6


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)       # byte stuffing

    def align(self) -> None:
        if self.n:
            self.put(0x7F, 8 - self.n)      # pad with 1s


def _size(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _emit_coeff_bits(w: _BitWriter, v: int, t: int) -> None:
    if t:
        w.put(v if v >= 0 else v + (1 << t) - 1, t)


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int) -> int:
    diff = int(zz[0]) - pred
    t = _size(diff)
    w.put(_DC_CODE[t], 8)
    _emit_coeff_bits(w, diff, t)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                w.put(_AC_CODE[0x00], 8)    # EOB
                break
            run += 1
            continue
        while run > 15:
            w.put(_AC_CODE[0xF0], 8)        # ZRL
            run -= 16
        t = _size(v)
        w.put(_AC_CODE[(run << 4) | t], 8)
        _emit_coeff_bits(w, v, t)
        run = 0
    return int(zz[0])


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad (edge) to 8-multiples, FDCT + quantize -> (rows, cols, 64)
    zigzag int32."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane.astype(np.float64) - 128.0,
               ((0, ph - h), (0, pw - w)), mode="edge")
    rows, cols = ph // 8, pw // 8
    blks = (p.reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))
    F = np.einsum("ik,nkl,jl->nij", _C, blks, _C, optimize=True)
    zz = F.reshape(-1, 64)[:, ZIGZAG]
    qz = np.round(zz / q[np.newaxis, :]).astype(np.int32)
    return qz.reshape(rows, cols, 64)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def encode_jpeg(img: np.ndarray, *, subsample: tuple[int, int] = (1, 1),
                restart: int = 0):
    """-> (jpeg_bytes, [per-component (rows, cols, 64) coeff blocks],
    hv list). Grayscale when img.ndim == 2."""
    gray = img.ndim == 2
    if gray:
        planes = [img.astype(np.float64)]
        hvs = [(1, 1)]
        qts = [0]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        sh, sv = subsample
        H, W = img.shape[:2]
        # pad to the MCU grid FIRST so subsampled planes cover it
        ph, pw = -(-H // (8 * sv)) * 8 * sv, -(-W // (8 * sh)) * 8 * sh

        def padp(p):
            return np.pad(p, ((0, ph - H), (0, pw - W)), mode="edge")
        y, cb, cr = padp(y), padp(cb), padp(cr)
        if sh > 1 or sv > 1:
            cb = cb.reshape(ph // sv, sv, pw // sh, sh).mean((1, 3))
            cr = cr.reshape(ph // sv, sv, pw // sh, sh).mean((1, 3))
        planes = [np.clip(np.round(y), 0, 255),
                  np.clip(np.round(cb), 0, 255),
                  np.clip(np.round(cr), 0, 255)]
        hvs = [subsample, (1, 1), (1, 1)]
        qts = [0, 1, 1]
    blocks = [_plane_blocks(p, _QLUM if t == 0 else _QCHR)
              for p, t in zip(planes, qts)]

    out = bytearray(b"\xFF\xD8")
    # DQT entries are stored in zigzag order — our tables are flat in
    # zigzag already (uniform except index 0, which IS zigzag 0)
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in _QLUM))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(int(v) for v in _QCHR))
    h, w = img.shape[:2]
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for i, (sh, sv) in enumerate(hvs):
        sof += bytes([i + 1, (sh << 4) | sv, qts[i]])
    out += _seg(0xC0, sof)
    for cls, tid, counts, syms in (
            (0, 0, _DC_COUNTS, _DC_SYMS), (1, 0, _AC_COUNTS, _AC_SYMS)):
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts)
                    + bytes(syms))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        sos += bytes([i + 1, 0x00])         # all use table 0/0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    wtr = _BitWriter()
    hmax = max(hv[0] for hv in hvs)
    vmax = max(hv[1] for hv in hvs)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    pred = [0] * len(planes)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                wtr.align()
                out += bytes(wtr.out)
                wtr.out.clear()
                out += bytes([0xFF, 0xD0 + ((mcu_i // restart - 1) % 8)])
                pred = [0] * len(planes)
            for ci, (sh, sv) in enumerate(hvs):
                for v in range(sv):
                    for hh in range(sh):
                        zz = blocks[ci][my * sv + v, mx * sh + hh]
                        pred[ci] = _encode_block(wtr, zz, pred[ci])
            mcu_i += 1
    wtr.align()
    out += bytes(wtr.out) + b"\xFF\xD9"
    return bytes(out), blocks, hvs


# --- tests ----------------------------------------------------------------


@pytest.mark.parametrize("shape,sub,rst", [
    ((16, 16), (1, 1), 0), ((13, 21), (1, 1), 0), ((32, 24), (2, 2), 0),
    ((17, 19), (2, 2), 0), ((16, 16), (2, 1), 0), ((16, 16), (1, 2), 0),
    ((40, 40), (2, 2), 2), ((24, 16), (1, 1), 1),
])
def test_coefficients_roundtrip_exact(shape, sub, rst):
    rng = np.random.default_rng(shape[0] + sub[0] * 7 + rst)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    payload, want, hvs = encode_jpeg(img, subsample=sub, restart=rst)
    frame, got, _ = decode_jpeg_coeffs(payload)
    assert [(c["h"], c["v"]) for c in frame["comps"]] == hvs
    for ci in range(3):
        np.testing.assert_array_equal(got[ci], want[ci]), ci


def test_constant_color_decodes_near_exact():
    img = np.full((24, 24, 3), 0, np.uint8)
    img[:, :] = (180, 40, 90)
    payload, _, _ = encode_jpeg(img)
    out = decode_jpeg(payload)
    assert out.shape == (24, 24, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_smooth_gradient_within_quantization_error():
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack([(yy * 3) % 256, (xx * 2) % 256,
                    ((yy + xx) * 2) % 256], axis=2).astype(np.uint8)
    img = (img // 4 + 96).astype(np.uint8)    # gentle ramps
    payload, _, _ = encode_jpeg(img)
    out = decode_jpeg(payload)
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.max() <= 14 and diff.mean() <= 3.0


def test_subsampled_smooth_tolerance():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([128 + yy, 128 + xx // 2, 120 + (yy + xx) // 4],
                   axis=2).clip(0, 255).astype(np.uint8)
    payload, _, _ = encode_jpeg(img, subsample=(2, 2))
    out = decode_jpeg(payload)
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.max() <= 20 and diff.mean() <= 4.0


def test_grayscale():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    payload, want, _ = encode_jpeg(g)
    frame, got, _ = decode_jpeg_coeffs(payload)
    np.testing.assert_array_equal(got[0], want[0])
    out = decode_jpeg(payload)
    assert out.shape == (16, 24, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all()


def test_rejections():
    img = np.zeros((8, 8, 3), np.uint8)
    payload, _, _ = encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" + payload)
    # progressive: flip SOF0 marker to SOF2
    idx = payload.index(b"\xFF\xC0")
    prog = payload[:idx] + b"\xFF\xC2" + payload[idx + 2:]
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(prog)
    # 12-bit precision
    deep = bytearray(payload)
    deep[idx + 4] = 12
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg(bytes(deep))


def test_image_stage_decodes_jpeg_end_to_end(ray_session):
    import ray.data
    from tantivy4java_ray.stages.multimodal import ImageDecodeResize
    yy, xx = np.mgrid[0:32, 0:40]
    imgs = [np.stack([(100 + yy + i * 5) % 256, (80 + xx) % 256,
                      np.full_like(yy, 60 + i)], axis=2
                     ).astype(np.uint8) for i in range(4)]
    payloads = [encode_jpeg(im, subsample=(2, 2))[0] for im in imgs]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "image": payloads})
    out = (ray.data.from_arrow(pa.Table.from_pandas(df))
           .map_batches(ImageDecodeResize,
                        fn_constructor_kwargs=dict(size=(16, 16)),
                        batch_size=2, concurrency=1,
                        batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.shape[0] == 4
    assert (out["height"] == 16).all()
