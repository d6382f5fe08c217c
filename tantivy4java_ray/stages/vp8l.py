"""WebP-lossless (VP8L) decoder — pure stdlib + numpy, no codec
library. Together with JPEG/PNG/GIF this closes the common-web-format
set; lossy WebP (VP8) and AVIF still raise honestly (their DCT/AV1
decoders are codec-library territory).

Implements the public VP8L bitstream (RFC 9649 / WebP lossless spec):
LSB-first bit reader, simple + normal canonical prefix codes (with the
code-length code, 16/17/18 repeats and the max-symbol short-circuit),
color cache, LZ77 backrefs with the 120-entry 2D distance map, meta
prefix groups, and all four transforms — predictor (14 modes), cross
color, subtract-green, color indexing incl. sub-byte pixel bundling.
Transforms invert in reverse order; sub-images (transform data,
entropy image, palette) decode through the same machinery.

Truncated/corrupt payloads fail CLOSED with ValueError (crawl bytes
are routinely damaged — see tests/test_codec_robustness.py).
"""

from __future__ import annotations

import numpy as np

#: code-length-code read order (spec kCodeLengthCodeOrder)
CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
            14, 15)

#: 2D neighbor map for distance codes 1..120: (dx, dy) pairs
DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))


class _Bits:
    """LSB-first bit reader over bytes."""

    __slots__ = ("d", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.d):
                raise ValueError("truncated VP8L stream")
            self.acc |= self.d[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.n -= nbits
        return v


class _Prefix:
    """Canonical prefix code. ``single`` holds the symbol of a 1-symbol
    code (read consumes ZERO bits, per spec)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: np.ndarray):
        used = np.flatnonzero(lengths)
        if len(used) == 0:
            raise ValueError("VP8L prefix code with no symbols")
        if len(used) == 1:
            self.single = int(used[0])
            self.table = None
            return
        self.single = None
        # DEFLATE-style canonical assignment: by (length, symbol)
        table: dict[tuple[int, int], int] = {}
        code = 0
        maxlen = int(lengths.max())
        for ln in range(1, maxlen + 1):
            for sym in np.flatnonzero(lengths == ln):
                table[(ln, code)] = int(sym)
                code += 1
            code <<= 1
        if code != (1 << (maxlen + 1)):
            raise ValueError("VP8L prefix code is not complete")
        self.table = table

    @classmethod
    def single_symbol(cls, sym: int) -> "_Prefix":
        o = cls.__new__(cls)
        o.single = int(sym)
        o.table = None
        return o

    @classmethod
    def two_symbols(cls, s0: int, s1: int) -> "_Prefix":
        o = cls.__new__(cls)
        o.single = None
        o.table = {(1, 0): int(s0), (1, 1): int(s1)}
        return o

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code in stream")


def _read_prefix_code(br: _Bits, alphabet: int) -> _Prefix:
    if br.read(1):                           # simple code
        nsym = br.read(1) + 1
        if br.read(1):                       # first symbol is 8-bit
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        if nsym == 1:
            return _Prefix.single_symbol(s0)
        s1 = br.read(8)
        return _Prefix.two_symbols(s0, s1)
    # normal: code-length code first
    num_cl = 4 + br.read(4)
    cl_lengths = np.zeros(19, np.int64)
    for i in range(num_cl):
        cl_lengths[CL_ORDER[i]] = br.read(3)
    cl = _Prefix(cl_lengths)
    if br.read(1):                           # max-symbol short-circuit
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = np.zeros(alphabet, np.int64)
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = cl.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            lengths[i:i + rep] = prev
            i += rep
        elif sym == 17:
            i += 3 + br.read(3)
        else:                                # 18
            i += 11 + br.read(7)
    if i > alphabet:
        raise ValueError("VP8L code lengths overflow the alphabet")
    return _Prefix(lengths)


def _lendist_value(code: int, br: _Bits) -> int:
    """LZ77 length/distance prefix value -> actual value (1-based)."""
    if code < 4:
        return code + 1
    nbits = (code - 2) >> 1
    offset = (2 + (code & 1)) << nbits
    return offset + br.read(nbits) + 1


def _decode_image(br: _Bits, w: int, h: int,
                  allow_meta: bool) -> np.ndarray:
    """Spatially-coded ARGB image -> (h, w) uint32 pixels."""
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid VP8L color-cache size")
        cache = np.zeros(1 << cache_bits, np.uint32)
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _decode_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    groups = []
    cache_syms = (1 << cache_bits) if cache is not None else 0
    for _g in range(n_groups):
        gcode = _read_prefix_code(br, 256 + 24 + cache_syms)
        rcode = _read_prefix_code(br, 256)
        bcode = _read_prefix_code(br, 256)
        acode = _read_prefix_code(br, 256)
        dcode = _read_prefix_code(br, 40)
        groups.append((gcode, rcode, bcode, acode, dcode))
    out = np.zeros(w * h, np.uint32)
    pos = 0
    total = w * h
    g = groups[0]
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        sym = g[0].read(br)
        if sym < 256:                        # literal: G, R, B, A
            green = sym
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[((0x1E35A7BD * int(px)) & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = px
            pos += 1
        elif sym < 280:                      # LZ77 backref
            length = _lendist_value(sym - 256, br)
            dcode_v = _lendist_value(g[4].read(br), br)
            if dcode_v > 120:
                dist = dcode_v - 120
            else:
                dx, dy = DIST_MAP[dcode_v - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backref out of range")
            for k in range(length):          # overlap-safe copy
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[((0x1E35A7BD * int(px)) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
                pos += 1
        else:                                # color-cache hit
            if cache is None:
                raise ValueError("VP8L cache symbol without a cache")
            out[pos] = cache[sym - 280]
            pos += 1
    return out.reshape(h, w)


def _apply_predictor(img: np.ndarray, modes: np.ndarray,
                     bits: int) -> None:
    """In-place inverse predictor transform over (h, w, 4) uint8 ARGB
    channels [A, R, G, B]. The scan order recurrence is inherently
    sequential; per-pixel work is a tiny vector op over 4 channels."""
    h, w, _ = img.shape
    p = img.astype(np.int32)

    def px(x, y):
        return p[y, x]

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = px(x - 1, 0)
            elif x == 0:
                pred = px(0, y - 1)
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = px(x - 1, y)
                T = px(x, y - 1)
                TL = px(x - 1, y - 1)
                TR = px(x + 1, y - 1) if x + 1 < w else px(0, y)
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
                elif mode == 5:
                    pred = ((L + TR) // 2 + T) // 2
                elif mode == 6:
                    pred = (L + TL) // 2
                elif mode == 7:
                    pred = (L + T) // 2
                elif mode == 8:
                    pred = (TL + T) // 2
                elif mode == 9:
                    pred = (T + TR) // 2
                elif mode == 10:
                    pred = ((L + TL) // 2 + (T + TR) // 2) // 2
                elif mode == 11:             # Select
                    pl = int(np.abs(T - TL).sum())
                    pt = int(np.abs(L - TL).sum())
                    pred = L if pl < pt else T
                elif mode == 12:             # ClampAddSubtractFull
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:             # ClampAddSubtractHalf
                    avg = (L + T) // 2
                    d = avg - TL             # C-style trunc-toward-zero
                    pred = np.clip(avg + np.sign(d) * (np.abs(d) // 2),
                                   0, 255)
                else:
                    raise ValueError(f"invalid predictor mode {mode}")
            p[y, x] = (p[y, x] + pred) & 0xFF
    img[:] = p.astype(np.uint8)


def _delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5, elementwise."""
    return (t.astype(np.int8).astype(np.int32)
            * c.astype(np.int8).astype(np.int32)) >> 5


#: decode bound: a corrupt header can claim 16384x16384 while
#: zero-bit single-symbol codes make every pixel FREE, turning a
#: 30-byte payload into a quarter-billion-iteration Python loop — a
#: decoder DoS with ~10^6x CPU amplification. 2^22 pixels (4 MPx,
#: ~2048x2048) covers crawl images; raise max_pixels for known-good
#: larger files.
MAX_PIXELS = 1 << 22
#: real VP8L rarely compresses past ~200:1; zero-bit-code attack
#: streams are millions:1. Pixels-per-payload-byte sanity bound.
MAX_PIXELS_PER_BYTE = 1024


def decode_vp8l(payload: bytes,
                max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """Raw VP8L chunk payload -> (H, W, 3) uint8 RGB (alpha dropped)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    if w * h > max_pixels:
        raise ValueError(
            f"VP8L dimensions {w}x{h} exceed the {max_pixels}-pixel "
            f"decode bound (corrupt header or pass a larger max_pixels)")
    if w * h > MAX_PIXELS_PER_BYTE * len(payload):
        raise ValueError(
            f"VP8L claims {w}x{h} pixels from {len(payload)} bytes — "
            f"implausible compression ratio (zero-bit-code DoS header)")
    br.read(1)                               # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    transforms = []
    palette = None
    coded_w = w
    while br.read(1):
        ttype = br.read(2)
        if any(t[0] == ttype for t in transforms):
            raise ValueError("duplicate VP8L transform")
        if ttype == 2:                       # subtract green
            transforms.append((2, None, 0))
        elif ttype in (0, 1):                # predictor / cross color
            tbits = br.read(3) + 2
            tw = -(-coded_w // (1 << tbits))
            th = -(-h // (1 << tbits))
            sub = _decode_image(br, tw, th, False)
            transforms.append((ttype, sub, tbits))
        else:                                # 3: color indexing
            ncolors = br.read(8) + 1
            praw = _decode_image(br, ncolors, 1, False)[0]
            # palette pixels are DELTA-coded componentwise
            pal = np.zeros((ncolors, 4), np.uint32)
            acc = np.zeros(4, np.uint32)
            for i in range(ncolors):
                v = int(praw[i])
                comp = np.array([(v >> 24) & 0xFF, (v >> 16) & 0xFF,
                                 (v >> 8) & 0xFF, v & 0xFF], np.uint32)
                acc = (acc + comp) & 0xFF
                pal[i] = acc
            palette = pal                    # [A, R, G, B]
            if ncolors <= 2:
                wbits = 3
            elif ncolors <= 4:
                wbits = 2
            elif ncolors <= 16:
                wbits = 1
            else:
                wbits = 0
            coded_w = -(-coded_w // (1 << wbits))
            transforms.append((3, palette, wbits))
    argb = _decode_image(br, coded_w, h, True)
    # unpack to channel planes [A, R, G, B]
    img = np.stack([(argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                    (argb >> 8) & 0xFF, argb & 0xFF],
                   axis=-1).astype(np.uint8)
    for ttype, data, bits in reversed(transforms):
        if ttype == 3:                       # color indexing
            pal, wbits = data, bits
            if wbits:
                per = 1 << wbits             # pixels per packed byte
                ib = 8 >> wbits              # index bit width
                green = img[:, :, 2].astype(np.uint32)
                idx = np.zeros((h, w), np.uint32)
                xs = np.arange(w)
                src = green[:, xs >> wbits]
                shift = (xs % per) * ib
                idx = (src >> shift[np.newaxis, :]) & ((1 << ib) - 1)
            else:
                idx = img[:, :, 2].astype(np.uint32)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("VP8L palette index out of range")
            img = pal[idx].astype(np.uint8)
        elif ttype == 2:                     # add green back
            img[:, :, 1] = (img[:, :, 1].astype(np.int32)
                            + img[:, :, 2]) & 0xFF   # red += green
            img[:, :, 3] = (img[:, :, 3].astype(np.int32)
                            + img[:, :, 2]) & 0xFF   # blue += green
        elif ttype == 1:                     # cross color (inverse)
            sub = data
            g2r = ((sub >> 0) & 0xFF)        # stored in blue channel
            g2b = ((sub >> 8) & 0xFF)        # stored in green channel
            r2b = ((sub >> 16) & 0xFF)       # stored in red channel
            ys = np.arange(h) >> bits
            xs = np.arange(w) >> bits
            G2R = g2r[ys][:, xs]
            G2B = g2b[ys][:, xs]
            R2B = r2b[ys][:, xs]
            green = img[:, :, 2]
            red = (img[:, :, 1].astype(np.int32)
                   + _delta(G2R, green)) & 0xFF
            blue = (img[:, :, 3].astype(np.int32)
                    + _delta(G2B, green)) & 0xFF
            blue = (blue + _delta(R2B, red.astype(np.uint8))) & 0xFF
            img[:, :, 1] = red.astype(np.uint8)
            img[:, :, 3] = blue.astype(np.uint8)
        else:                                # predictor (inverse)
            modes = ((data >> 8) & 0xFF).astype(np.int64)
            _apply_predictor(img, modes, bits)
    return np.ascontiguousarray(img[:, :, [1, 2, 3]])   # R, G, B


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP container -> (H, W, 3) uint8 RGB. Lossless (VP8L) decodes
    natively; lossy (VP8) and extended-feature files whose image data
    is VP8 raise NotImplementedError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    try:
        return _decode_webp_chunks(payload)
    except IndexError:
        raise ValueError("truncated WebP container") from None


def _decode_webp_chunks(payload: bytes) -> np.ndarray:
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)         # chunks are 2-byte aligned
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs a codec library; lossless VP8L "
                "decodes natively")
        # VP8X/ICCP/EXIF/ANIM etc.: keep scanning for the image chunk
    raise ValueError("WebP container has no image chunk")
