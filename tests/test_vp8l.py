"""VP8L (lossless WebP) decoder tests against an independent reference
encoder. VP8L is lossless, so every round-trip is EXACT. The encoder
writes spec-literal streams — simple and normal prefix codes (complete
canonical two-level length assignment), LZ77 backrefs, color cache,
meta prefix groups, and all four transforms — sharing nothing with the
decoder but the public constants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tantivy4java_ray.stages.vp8l import (CL_ORDER, decode_vp8l,
                                          decode_webp)

# --- bit writer + canonical code helpers ----------------------------------


class _WBits:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:       # LSB-first
        self.acc |= (val & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


def complete_lengths(nsym: int) -> list[int]:
    """Code lengths for a COMPLETE canonical code over nsym symbols:
    two adjacent lengths (Kraft equality)."""
    if nsym == 1:
        return [1]          # handled as a 1-symbol code by the reader
    k = (nsym - 1).bit_length()
    n_long = 2 * (nsym - (1 << (k - 1)))
    n_short = nsym - n_long
    return [k - 1] * n_short + [k] * n_long


def canon_codes(syms: list[int], lengths: list[int]) -> dict[int, tuple]:
    """{symbol: (code, len)} canonical by (length, symbol)."""
    order = sorted(zip(syms, lengths), key=lambda t: (t[1], t[0]))
    codes = {}
    code = 0
    prev_len = order[0][1]
    for s, ln in order:
        code <<= (ln - prev_len)
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _CodeW:
    """Writable prefix code over a set of used symbols."""

    def __init__(self, used: list[int], alphabet: int):
        used = sorted(set(used))
        self.used = used
        self.alphabet = alphabet
        self.simple = (len(used) <= 2 and all(s <= 255 for s in used))
        if not self.simple:
            # assign shorter codes to smaller symbols (sorted order)
            self.codes = canon_codes(used, complete_lengths(len(used)))
        elif len(used) == 2:
            self.codes = {used[0]: (0, 1), used[1]: (1, 1)}
        else:
            self.codes = {used[0]: (0, 0)}   # zero-bit single symbol

    def write_def(self, w: _WBits) -> None:
        if self.simple:
            w.put(1, 1)                      # simple
            w.put(len(self.used) - 1, 1)
            s0 = self.used[0]
            if s0 > 1:
                w.put(1, 1)
                w.put(s0, 8)
            else:
                w.put(0, 1)
                w.put(s0, 1)
            if len(self.used) == 2:
                w.put(self.used[1], 8)
            return
        w.put(0, 1)                          # normal
        lengths = np.zeros(self.alphabet, np.int64)
        for s, (_c, ln) in self.codes.items():
            lengths[s] = ln
        # code-length code over the cl symbols we will emit (no repeats:
        # every length literal, zeros included)
        cl_used = sorted(set(int(v) for v in lengths))
        clw = _CodeW(cl_used, 19)
        cl_lengths = np.zeros(19, np.int64)
        for s, (_c, ln) in clw.codes.items():
            cl_lengths[s] = max(ln, 1) if len(cl_used) > 1 else 1
        # emit all 19 slots (num_code_lengths = 19)
        w.put(19 - 4, 4)
        for s in CL_ORDER:
            w.put(int(cl_lengths[s]), 3)
        w.put(0, 1)                          # no max-symbol shortcut
        for v in lengths:
            if len(cl_used) == 1:
                continue                     # 1-symbol CL code: 0 bits
            c, ln = clw.codes[int(v)]
            self._put_msb(w, c, ln)

    @staticmethod
    def _put_msb(w: _WBits, code: int, ln: int) -> None:
        for i in range(ln - 1, -1, -1):      # MSB-first (reader order)
            w.put((code >> i) & 1, 1)

    def write_sym(self, w: _WBits, s: int) -> None:
        c, ln = self.codes[s]
        self._put_msb(w, c, ln)


def _lendist_sym(v: int):
    """Inverse of the decoder's length/distance value coding:
    value (1-based) -> (prefix_sym, extra_bits_value, n_extra_bits)."""
    t = v - 1
    if t < 4:
        return t, 0, 0
    nb = t.bit_length() - 2
    b = (t >> nb) - 2
    return 2 * nb + 2 + b, t - ((2 + b) << nb), nb


# --- image writer ---------------------------------------------------------


def _hash(px: int, bits: int) -> int:
    return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - bits)


def write_image(w: _WBits, px: np.ndarray, *, cache_bits: int = 0,
                lz77: bool = False, meta: np.ndarray | None = None,
                meta_bits: int = 0, is_sub: bool = False) -> None:
    """Entropy-code an (h, w) uint32 ARGB image. ``meta``: optional
    (mh, mw) group-index image (groups chosen per pixel). Sub-images
    (transform data, palettes, the meta image itself) carry NO
    meta-prefix bit, per spec."""
    h, wdt = px.shape
    flat = px.ravel()
    w.put(1 if cache_bits else 0, 1)
    if cache_bits:
        w.put(cache_bits, 4)
    n_groups = 1
    if not is_sub:
        if meta is not None:
            w.put(1, 1)
            w.put(meta_bits - 2, 3)
            write_image(w, (meta.astype(np.uint32) << 8),
                        is_sub=True)         # green = index
            n_groups = int(meta.max()) + 1
        else:
            w.put(0, 1)

    # plan the symbol stream (shared across groups for code sizing)
    events = []          # (gidx, kind, payload)
    cache = np.zeros(1 << cache_bits, np.uint32) if cache_bits else None
    i = 0
    n = len(flat)
    while i < n:
        if meta is not None:
            y, x = divmod(i, wdt)
            gi = int(meta[y >> meta_bits, x >> meta_bits])
        else:
            gi = 0
        v = int(flat[i])
        if lz77 and i and flat[i - 1] == v:
            run = 1
            while i + run < n and int(flat[i + run]) == v and run < 100:
                run += 1
            events.append((gi, "ref", (run, 1)))
            if cache is not None:
                cache[_hash(v, cache_bits)] = v
            i += run
            continue
        if cache is not None and cache[_hash(v, cache_bits)] == v:
            events.append((gi, "cache", _hash(v, cache_bits)))
            i += 1
            continue
        events.append((gi, "lit", v))
        if cache is not None:
            cache[_hash(v, cache_bits)] = v
        i += 1

    for gi in range(n_groups):
        g_used, r_used, b_used, a_used, d_used = set(), set(), set(), \
            set(), set()
        for egi, kind, payload in events:
            if egi != gi:
                continue
            if kind == "lit":
                v = payload
                g_used.add((v >> 8) & 0xFF)
                r_used.add((v >> 16) & 0xFF)
                b_used.add(v & 0xFF)
                a_used.add((v >> 24) & 0xFF)
            elif kind == "ref":
                ln, dist = payload
                g_used.add(256 + _lendist_sym(ln)[0])
                d_used.add(_lendist_sym(dist + 120)[0])
            else:
                g_used.add(280 + payload)
        gw = _CodeW(sorted(g_used) or [0],
                    256 + 24 + ((1 << cache_bits) if cache_bits else 0))
        rw = _CodeW(sorted(r_used) or [0], 256)
        bw = _CodeW(sorted(b_used) or [0], 256)
        aw = _CodeW(sorted(a_used) or [0], 256)
        dw = _CodeW(sorted(d_used) or [0], 40)
        for cw in (gw, rw, bw, aw, dw):
            cw.write_def(w)
        if gi == 0:
            group_codes = {}
        group_codes[gi] = (gw, rw, bw, aw, dw)

    for gi, kind, payload in events:
        gw, rw, bw, aw, dw = group_codes[gi]
        if kind == "lit":
            v = payload
            gw.write_sym(w, (v >> 8) & 0xFF)
            rw.write_sym(w, (v >> 16) & 0xFF)
            bw.write_sym(w, v & 0xFF)
            aw.write_sym(w, (v >> 24) & 0xFF)
        elif kind == "ref":
            ln, dist = payload
            s, extra, nb = _lendist_sym(ln)
            gw.write_sym(w, 256 + s)
            w.put(extra, nb)
            s, extra, nb = _lendist_sym(dist + 120)
            dw.write_sym(w, s)
            w.put(extra, nb)
        else:
            gw.write_sym(w, 280 + payload)


def _argb(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB uint8 -> (h, w) uint32 ARGB (alpha 255)."""
    r = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    b = img[:, :, 2].astype(np.uint32)
    return (np.uint32(255) << 24) | (r << 16) | (g << 8) | b


def encode_vp8l(img: np.ndarray, *, cache_bits: int = 0,
                lz77: bool = False, subtract_green: bool = False,
                palette: np.ndarray | None = None,
                predictor_mode: int | None = None,
                color_element: tuple | None = None,
                meta_split: bool = False) -> bytes:
    h, wdt = img.shape[:2]
    w = _WBits()
    w.put(wdt - 1, 14)
    w.put(h - 1, 14)
    w.put(0, 1)                              # alpha hint
    w.put(0, 3)                              # version
    px = _argb(img)

    if predictor_mode is not None:
        tbits = 4                            # block size 16
        tw, th = -(-wdt // 16), -(-h // 16)
        w.put(1, 1)
        w.put(0, 2)                          # predictor
        w.put(tbits - 2, 3)
        write_image(w, np.full((th, tw),
                               np.uint32(predictor_mode) << 8,
                               np.uint32), is_sub=True)
        px = _forward_predict(px, predictor_mode)
    if color_element is not None:
        g2r, g2b, r2b = color_element
        tbits = 4
        tw, th = -(-wdt // 16), -(-h // 16)
        w.put(1, 1)
        w.put(1, 2)                          # cross color
        w.put(tbits - 2, 3)
        elem = (np.uint32(r2b & 0xFF) << 16) | \
            (np.uint32(g2b & 0xFF) << 8) | np.uint32(g2r & 0xFF)
        write_image(w, np.full((th, tw), elem, np.uint32),
                    is_sub=True)
        px = _forward_color(px, g2r, g2b, r2b)
    if subtract_green:
        w.put(1, 1)
        w.put(2, 2)
        a = (px >> 24) & 0xFF
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        px = (a << 24) | (((r - g) & 0xFF) << 16) | (g << 8) \
            | ((b - g) & 0xFF)
    if palette is not None:
        ncolors = len(palette)
        w.put(1, 1)
        w.put(3, 2)
        w.put(ncolors - 1, 8)
        pal_argb = _argb(palette[np.newaxis, :, :])[0]
        deltas = np.zeros(ncolors, np.uint32)
        prev = np.zeros(4, np.uint32)
        for i in range(ncolors):
            v = int(pal_argb[i])
            comp = np.array([(v >> 24) & 0xFF, (v >> 16) & 0xFF,
                             (v >> 8) & 0xFF, v & 0xFF], np.uint32)
            d = (comp - prev) & 0xFF
            deltas[i] = (d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3]
            prev = comp
        write_image(w, deltas[np.newaxis, :], is_sub=True)
        # map pixels to indices, then bundle
        lut = {int(v): i for i, v in enumerate(pal_argb)}
        idx = np.vectorize(lambda v: lut[int(v)])(px).astype(np.uint32)
        if ncolors <= 2:
            wbits = 3
        elif ncolors <= 4:
            wbits = 2
        elif ncolors <= 16:
            wbits = 1
        else:
            wbits = 0
        if wbits:
            per = 1 << wbits
            ib = 8 >> wbits
            cw = -(-wdt // per)
            packed = np.zeros((h, cw), np.uint32)
            for x in range(wdt):
                packed[:, x >> wbits] |= idx[:, x] << ((x % per) * ib)
            px = (np.uint32(255) << 24) | (packed << 8)
        else:
            px = (np.uint32(255) << 24) | (idx << 8)
    w.put(0, 1)                              # no more transforms

    meta = None
    meta_bits = 0
    if meta_split:
        meta_bits = 2                        # 4-pixel blocks
        mh, mw = -(-px.shape[0] // 4), -(-px.shape[1] // 4)
        meta = ((np.add.outer(np.arange(mh), np.arange(mw)))
                % 2).astype(np.uint32)
    write_image(w, px, cache_bits=cache_bits, lz77=lz77, meta=meta,
                meta_bits=meta_bits)
    body = b"\x2f" + w.flush()
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    return (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little")
            + b"WEBP" + chunk)


def _forward_predict(px: np.ndarray, mode: int) -> np.ndarray:
    """Forward (residual) predictor transform, scalar per spec; the
    decoder's inverse must undo it exactly."""
    h, w = px.shape
    ch = np.stack([(px >> 24) & 0xFF, (px >> 16) & 0xFF,
                   (px >> 8) & 0xFF, px & 0xFF], axis=-1).astype(np.int32)
    res = np.zeros_like(ch)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = ch[0, x - 1]
            elif x == 0:
                pred = ch[y - 1, 0]
            else:
                L = ch[y, x - 1]
                T = ch[y - 1, x]
                TL = ch[y - 1, x - 1]
                TR = ch[y - 1, x + 1] if x + 1 < w else ch[y, 0]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 7:
                    pred = (L + T) // 2
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                else:
                    raise NotImplementedError(mode)
            res[y, x] = (ch[y, x] - pred) & 0xFF
    return ((res[:, :, 0].astype(np.uint32) << 24)
            | (res[:, :, 1].astype(np.uint32) << 16)
            | (res[:, :, 2].astype(np.uint32) << 8)
            | res[:, :, 3].astype(np.uint32))


def _fdelta(t: int, c: np.ndarray) -> np.ndarray:
    t8 = np.int32(np.int8(np.uint8(t)))
    return (t8 * c.astype(np.int8).astype(np.int32)) >> 5


def _forward_color(px: np.ndarray, g2r: int, g2b: int,
                   r2b: int) -> np.ndarray:
    a = (px >> 24) & 0xFF
    r = (px >> 16) & 0xFF
    g = (px >> 8) & 0xFF
    b = px & 0xFF
    r_res = (r.astype(np.int32) - _fdelta(g2r, g)) & 0xFF
    b_res = (b.astype(np.int32) - _fdelta(g2b, g)
             - _fdelta(r2b, r)) & 0xFF
    return ((a << 24) | (r_res.astype(np.uint32) << 16) | (g << 8)
            | b_res.astype(np.uint32))


# --- tests ----------------------------------------------------------------


def _rand_img(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (16, 16), (23, 31)])
def test_literal_roundtrip(shape):
    rng = np.random.default_rng(shape[0] * 5 + shape[1])
    img = _rand_img(rng, *shape)
    got = decode_webp(encode_vp8l(img))
    np.testing.assert_array_equal(got, img)


def test_subtract_green_and_cache_and_lz77():
    rng = np.random.default_rng(3)
    # repetitive image: long runs exercise LZ77; few colors hit the cache
    base = rng.integers(0, 4, (20, 30), dtype=np.uint8) * 60
    img = np.stack([base, (base + 7) % 256, (base * 2) % 256], axis=2)
    for kw in (dict(lz77=True), dict(cache_bits=4),
               dict(subtract_green=True),
               dict(lz77=True, cache_bits=6, subtract_green=True)):
        got = decode_webp(encode_vp8l(img, **kw))
        np.testing.assert_array_equal(got, img, err_msg=str(kw))


@pytest.mark.parametrize("ncolors,shape", [(2, (9, 17)), (4, (8, 8)),
                                           (13, (10, 23)), (40, (6, 7))])
def test_palette_with_bundling(ncolors, shape):
    rng = np.random.default_rng(ncolors)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    # distinct palette entries required for the index lookup
    pal[:, 0] = (np.arange(ncolors) * 7) % 256
    idx = rng.integers(0, ncolors, shape)
    img = pal[idx]
    got = decode_webp(encode_vp8l(img, palette=pal))
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, 7, 12])
def test_predictor_modes(mode):
    rng = np.random.default_rng(mode + 10)
    img = _rand_img(rng, 19, 21)
    got = decode_webp(encode_vp8l(img, predictor_mode=mode))
    np.testing.assert_array_equal(got, img, err_msg=f"mode {mode}")


def test_cross_color_transform():
    rng = np.random.default_rng(8)
    img = _rand_img(rng, 14, 18)
    for elem in ((0, 0, 0), (37, -20 & 0xFF, 5), (255, 128, 64)):
        got = decode_webp(encode_vp8l(img, color_element=elem))
        np.testing.assert_array_equal(got, img, err_msg=str(elem))


def test_meta_prefix_groups():
    rng = np.random.default_rng(9)
    img = _rand_img(rng, 13, 22)
    got = decode_webp(encode_vp8l(img, meta_split=True))
    np.testing.assert_array_equal(got, img)


def test_rejections_and_container():
    rng = np.random.default_rng(4)
    img = _rand_img(rng, 4, 4)
    good = encode_vp8l(img)
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"RIFX" + good[4:])
    # lossy VP8 chunk raises honestly
    lossy = good.replace(b"VP8L", b"VP8 ", 1)
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(lossy)
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00\x01\x02")


def test_image_stage_decodes_webp_end_to_end(ray_session):
    import ray.data
    from tantivy4java_ray.stages.multimodal import ImageDecodeResize
    rng = np.random.default_rng(6)
    imgs = [_rand_img(rng, 12, 10) for _ in range(3)]
    payloads = [encode_vp8l(im, subtract_green=True) for im in imgs]
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "image": payloads})
    out = (ray.data.from_arrow(pa.Table.from_pandas(df))
           .map_batches(ImageDecodeResize,
                        fn_constructor_kwargs=dict(size=(6, 6)),
                        batch_size=2, concurrency=1,
                        batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.shape[0] == 3 and (out["height"] == 6).all()


def test_pixel_bound_rejects_dos_header():
    """A tiny payload claiming 16384x16384 with zero-bit codes must be
    rejected up front, not ground through 268M Python iterations."""
    w = _WBits()
    w.put(16383, 14)
    w.put(16383, 14)
    w.put(0, 1)
    w.put(0, 3)
    with pytest.raises(ValueError, match="decode bound"):
        decode_vp8l(b"\x2f" + w.flush())
