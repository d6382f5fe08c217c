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
    idx = payload.index(b"\xFF\xC0")
    # lossless (SOF3) raises; a baseline full-band scan relabelled
    # progressive is MALFORMED (progressive DC scans must have Se=0)
    lossless = payload[:idx] + b"\xFF\xC3" + payload[idx + 2:]
    with pytest.raises(NotImplementedError, match="frame type"):
        decode_jpeg(lossless)
    fake_prog = payload[:idx] + b"\xFF\xC2" + payload[idx + 2:]
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(fake_prog)
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


# --- progressive (SOF2) reference encoder ---------------------------------

# EOBn symbols (r<<4, r=1..14) join the uniform 8-bit AC table
_AC_SYMS_P = _AC_SYMS + [r << 4 for r in range(1, 15)]
_AC_COUNTS_P = [0] * 16
_AC_COUNTS_P[7] = len(_AC_SYMS_P)
_AC_CODE_P = {s: i for i, s in enumerate(_AC_SYMS_P)}


class _ProgWriter(_BitWriter):
    """BitWriter + EOB-run state: ``eobrun`` pending all-zero(-tail)
    blocks, ``br`` their buffered refinement correction bits."""

    def __init__(self):
        super().__init__()
        self.eobrun = 0
        self.br: list[int] = []

    def flush_eob(self):
        if self.eobrun:
            j = self.eobrun
            r = j.bit_length() - 1
            self.put(_AC_CODE_P[r << 4], 8)
            if r:
                self.put(j - (1 << r), r)
            self.eobrun = 0
        for b in self.br:
            self.put(b, 1)
        self.br = []


def _enc_ac_first_block(w: _ProgWriter, vals: list[int]) -> None:
    if not any(vals):
        w.eobrun += 1
        return
    w.flush_eob()
    last_nz = max(i for i, v in enumerate(vals) if v)
    r = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            w.put(_AC_CODE_P[0xF0], 8)
            r -= 16
        w.put(_AC_CODE_P[(r << 4) | _size(v)], 8)
        _emit_coeff_bits(w, v, _size(v))
        r = 0
    if last_nz < len(vals) - 1:
        w.eobrun = 1


def _enc_ac_refine_block(w: _ProgWriter, band: list[int],
                         al: int) -> None:
    """T.81 G.1.2.3 refinement encoder, libjpeg's structure: ZRLs are
    emitted as the zero-HISTORY run passes 16 while still before the
    last newly-nonzero position (so they interleave correctly with
    nonzero-history positions whose correction bits buffer until the
    NEXT emitted symbol); everything after the last newly-nonzero
    folds into the EOB run."""
    t = [abs(v) >> al for v in band]
    new = [i for i, x in enumerate(t) if x == 1]
    if not new:
        w.br += [x & 1 for x in t if x > 1]
        w.eobrun += 1
        return
    eob = new[-1]
    r = 0
    pend: list[int] = []
    for i, x in enumerate(t):
        if x == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            w.flush_eob()              # pending run from prior blocks
            w.put(_AC_CODE_P[0xF0], 8)
            r -= 16
            for b in pend:
                w.put(b, 1)
            pend = []
        if x > 1:                      # already-nonzero: correction bit
            pend.append(x & 1)
            continue
        w.flush_eob()
        w.put(_AC_CODE_P[(r << 4) | 1], 8)
        w.put(1 if band[i] > 0 else 0, 1)
        for b in pend:
            w.put(b, 1)
        pend = []
        r = 0
    if r > 0 or pend:                  # tail folds into an EOB run
        w.eobrun = 1
        w.br = pend


def encode_jpeg_progressive(img: np.ndarray, *,
                            subsample: tuple[int, int] = (1, 1),
                            restart: int = 0,
                            bands=((1, 5), (6, 63))):
    """Progressive (SOF2) reference stream: DC first (Al=1, interleaved)
    -> DC refine -> per-component AC first per band (Al=1) -> per-
    component AC refine per band (Al=0). Returns the same
    (payload, blocks, hvs) contract as ``encode_jpeg``."""
    base, blocks, hvs = encode_jpeg(img, subsample=subsample)
    gray = img.ndim == 2
    ncomp = 1 if gray else 3
    qts = [0] if gray else [0, 1, 1]
    h, w = img.shape[:2]
    hmax = max(hv[0] for hv in hvs)
    vmax = max(hv[1] for hv in hvs)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    ni = []
    for sh, sv in hvs:
        ni.append(((-(-h * sv // vmax) + 7) // 8,
                   (-(-w * sh // hmax) + 7) // 8))

    out = bytearray(b"\xFF\xD8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in _QLUM))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(int(v) for v in _QCHR))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i, (sh, sv) in enumerate(hvs):
        sof += bytes([i + 1, (sh << 4) | sv, qts[i]])
    out += _seg(0xC2, sof)
    for cls, tid, counts, syms in (
            (0, 0, _DC_COUNTS, _DC_SYMS),
            (1, 0, _AC_COUNTS_P, _AC_SYMS_P)):
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts)
                    + bytes(syms))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))

    def sos(members, ss, se, ah, al):
        p = bytes([len(members)])
        for cid in members:
            p += bytes([cid, 0x00])
        return _seg(0xDA, p + bytes([ss, se, (ah << 4) | al]))

    def emit_scan(writer_fill, members, ss, se, ah, al):
        nonlocal out
        out += sos(members, ss, se, ah, al)
        w_ = _ProgWriter()
        writer_fill(w_)
        w_.flush_eob()
        w_.align()
        out += bytes(w_.out)

    def dc_unit_groups():
        """Restart units for DC scans: MCUs (interleaved) or single
        blocks (one-component), each as a list of (ci, block)."""
        if ncomp > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    yield [(ci, blocks[ci][my * sv + v, mx * sh + hh])
                           for ci, (sh, sv) in enumerate(hvs)
                           for v in range(sv) for hh in range(sh)]
        else:
            for by in range(ni[0][0]):
                for bx in range(ni[0][1]):
                    yield [(0, blocks[0][by, bx])]

    def _rst(w_, u):
        w_.align()
        w_.out += bytes([0xFF, 0xD0 + ((u // restart - 1) % 8)])

    def dc_first(w_):
        pred = [0] * ncomp
        u = 0
        for grp in dc_unit_groups():
            if restart and u and u % restart == 0:
                _rst(w_, u)
                pred = [0] * ncomp
            for ci, blk in grp:
                v = int(blk[0]) >> 1      # point transform Al=1
                d = v - pred[ci]
                pred[ci] = v
                t = _size(d)
                w_.put(_DC_CODE[t], 8)
                _emit_coeff_bits(w_, d, t)
            u += 1

    def dc_refine(w_):
        u = 0
        for grp in dc_unit_groups():
            if restart and u and u % restart == 0:
                _rst(w_, u)
            for _ci, blk in grp:
                w_.put(int(blk[0]) & 1, 1)
            u += 1

    emit_scan(dc_first, list(range(1, ncomp + 1)), 0, 0, 0, 1)
    emit_scan(dc_refine, list(range(1, ncomp + 1)), 0, 0, 1, 0)
    for ci in range(ncomp):
        rows, cols = ni[ci]
        for ss, se in bands:
            def ac1(w_, ci=ci, ss=ss, se=se, rows=rows, cols=cols):
                nb = 0
                for by in range(rows):
                    for bx in range(cols):
                        if restart and nb and nb % restart == 0:
                            w_.flush_eob()
                            w_.align()
                            w_.out += bytes(
                                [0xFF, 0xD0 + ((nb // restart - 1) % 8)])
                        blk = blocks[ci][by, bx]
                        vals = [(1 if int(v) > 0 else -1)
                                * (abs(int(v)) >> 1)
                                for v in blk[ss:se + 1]]
                        _enc_ac_first_block(w_, vals)
                        nb += 1
            emit_scan(ac1, [ci + 1], ss, se, 0, 1)
    for ci in range(ncomp):
        rows, cols = ni[ci]
        for ss, se in bands:
            def ac2(w_, ci=ci, ss=ss, se=se, rows=rows, cols=cols):
                nb = 0
                for by in range(rows):
                    for bx in range(cols):
                        if restart and nb and nb % restart == 0:
                            w_.flush_eob()
                            w_.align()
                            w_.out += bytes(
                                [0xFF, 0xD0 + ((nb // restart - 1) % 8)])
                        blk = blocks[ci][by, bx]
                        _enc_ac_refine_block(
                            w_, [int(v) for v in blk[ss:se + 1]], 0)
                        nb += 1
            emit_scan(ac2, [ci + 1], ss, se, 1, 0)
    out += b"\xFF\xD9"
    return bytes(out), blocks, hvs


@pytest.mark.parametrize("shape,sub", [
    ((16, 16), (1, 1)), ((13, 21), (1, 1)), ((32, 24), (2, 2)),
    ((17, 19), (2, 2)), ((24, 16), (2, 1)),
])
def test_progressive_coefficients_roundtrip_exact(shape, sub):
    rng = np.random.default_rng(shape[0] * 3 + sub[0])
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    payload, want, hvs = encode_jpeg_progressive(img, subsample=sub)
    frame, got, _ = decode_jpeg_coeffs(payload)
    assert frame["progressive"]
    for ci in range(3):
        # progressive scans cover the NON-INTERLEAVED grid; compare
        # there (the MCU-padding blocks outside it stay zero)
        nr = frame["comps"][ci]["ni_rows"]
        nc = frame["comps"][ci]["ni_cols"]
        np.testing.assert_array_equal(got[ci][:nr, :nc],
                                      want[ci][:nr, :nc]), ci


def test_progressive_full_decode_matches_baseline():
    yy, xx = np.mgrid[0:48, 0:40]
    img = np.stack([(90 + yy) % 256, (70 + xx) % 256,
                    (yy + xx) % 256], axis=2).astype(np.uint8)
    pb, _, _ = encode_jpeg(img)
    pp, _, _ = encode_jpeg_progressive(img)
    a = decode_jpeg(pb)
    b = decode_jpeg(pp)
    # same quantized coefficients on the shared non-interleaved grid ->
    # 4:4:4 grids coincide -> identical pixels
    np.testing.assert_array_equal(a, b)


def test_progressive_single_band_and_gray():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload, want, _ = encode_jpeg_progressive(img, bands=((1, 63),))
    _, got, _ = decode_jpeg_coeffs(payload)
    for ci in range(3):
        np.testing.assert_array_equal(got[ci], want[ci])
    g = rng.integers(0, 256, (24, 8), dtype=np.uint8)
    payload, want, _ = encode_jpeg_progressive(g)
    _, got, _ = decode_jpeg_coeffs(payload)
    np.testing.assert_array_equal(got[0], want[0])


def test_progressive_restart_markers():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    payload, want, _ = encode_jpeg_progressive(img, restart=3)
    _, got, _ = decode_jpeg_coeffs(payload)
    for ci in range(3):
        np.testing.assert_array_equal(got[ci], want[ci])


def test_progressive_randomized_fuzz():
    """Randomized encode->decode exact-coefficient sweep across sizes,
    subsampling, band splits and restart intervals (the refinement
    encoder/decoder pair has data-dependent paths — ZRL interleaving
    with correction bits, EOB-run folding — that fixed seeds miss;
    trial 103 of this fuzz found the r5 ZRL-ordering bug)."""
    rng = np.random.default_rng(42)
    for trial in range(25):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        sub = (int(rng.integers(1, 3)), int(rng.integers(1, 3)))
        rst = int(rng.choice([0, 0, 1, 2, 5]))
        bands = (((1, 63),) if rng.random() < 0.5
                 else ((1, int(rng.integers(2, 20))),
                       (int(rng.integers(2, 20)) + 1, 63)))
        bands = (bands if len(bands) == 1
                 else ((1, bands[0][1]), (bands[0][1] + 1, 63)))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload, want, _ = encode_jpeg_progressive(
            img, subsample=sub, restart=rst, bands=bands)
        frame, got, _ = decode_jpeg_coeffs(payload)
        for ci in range(3):
            nr = frame["comps"][ci]["ni_rows"]
            nc = frame["comps"][ci]["ni_cols"]
            np.testing.assert_array_equal(
                got[ci][:nr, :nc], want[ci][:nr, :nc],
                err_msg=f"trial {trial} comp {ci} "
                        f"({h}x{w} sub={sub} rst={rst} bands={bands})")


def encode_jpeg_noninterleaved(img: np.ndarray):
    """Sequential (SOF0) but NON-interleaved: one SOS per component,
    each a raster over its own block grid (T.81-legal; r5 review
    finding: this shape crashed)."""
    base, blocks, hvs = encode_jpeg(img)        # 4:4:4 grids == ni grids
    h, w = img.shape[:2]
    out = bytearray(b"\xFF\xD8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in _QLUM))
    out += _seg(0xDB, bytes([0x01]) + bytes(int(v) for v in _QCHR))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for i in range(3):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += _seg(0xC0, sof)
    for cls, tid, counts, syms in (
            (0, 0, _DC_COUNTS, _DC_SYMS), (1, 0, _AC_COUNTS, _AC_SYMS)):
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts)
                    + bytes(syms))
    for ci in range(3):
        out += _seg(0xDA, bytes([1, ci + 1, 0x00, 0, 63, 0]))
        w_ = _BitWriter()
        pred = 0
        rows, cols = blocks[ci].shape[:2]
        for by in range(rows):
            for bx in range(cols):
                pred = _encode_block(w_, blocks[ci][by, bx], pred)
        w_.align()
        out += bytes(w_.out)
    out += b"\xFF\xD9"
    return bytes(out), blocks


def test_noninterleaved_baseline_roundtrip():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    payload, want = encode_jpeg_noninterleaved(img)
    frame, got, _ = decode_jpeg_coeffs(payload)
    for ci in range(3):
        np.testing.assert_array_equal(got[ci], want[ci])
    # pixels identical to the interleaved encode of the same image
    pb, _, _ = encode_jpeg(img)
    np.testing.assert_array_equal(decode_jpeg(payload), decode_jpeg(pb))


def test_cmyk_component_count_raises():
    img = np.zeros((8, 8, 3), np.uint8)
    payload, _, _ = encode_jpeg(img)
    idx = payload.index(b"\xFF\xC0")
    # patch SOF: claim 4 components (header only — parse raises first)
    bad = bytearray(payload)
    ln = int.from_bytes(bad[idx + 2:idx + 4], "big")
    sof = bad[idx + 4:idx + 2 + ln]
    sof = sof[:5] + bytes([4]) + sof[6:] + bytes([4, 0x11, 1])
    bad[idx + 2:idx + 4] = struct.pack(">H", len(sof) + 2)
    bad[idx + 4:idx + 2 + ln] = sof
    with pytest.raises(NotImplementedError, match="CMYK"):
        decode_jpeg_coeffs(bytes(bad))
