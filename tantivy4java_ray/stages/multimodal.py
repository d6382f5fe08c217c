"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata.

Decode support in this environment (no PIL/opencv/ffmpeg):

- images: REAL decoders for JPEG — baseline AND progressive
  (``stages/jpeg.py``: Huffman entropy decode + vectorized
  IDCT/upsample/color, SOF0/SOF1/SOF2, 4:2:0/4:2:2/4:4:4, restart
  intervals), PNG (stdlib ``zlib`` inflate + numpy
  Sub/Up/Average/Paeth unfiltering; 8-bit gray/RGB/palette/RGBA,
  plain or Adam7-interlaced), GIF87a/89a (LZW, interlace, local
  palettes; first frame), lossless WebP (``stages/vp8l.py``: simple +
  normal prefix codes, LZ77, color cache, meta groups, all four
  transforms incl. pixel bundling), and the uncompressed containers
  PPM (P6) and BMP (24/32-bit), all with nearest-neighbor resize;
  lossy WebP (VP8) and AVIF raise ``NotImplementedError`` unless
  ``fake=True`` substitutes the deterministic stand-in.
- audio: REAL WAV/PCM decode via the stdlib ``wave`` module (8/16/32
  bit) AND native FLAC (``stages/flac.py``: Rice residuals,
  fixed/LPC prediction, stereo decorrelation — the speech-corpus
  format) -> per-frame RMS energies; MP3/OGG raise unless
  ``fake=True``.
- video: REAL Y4M (YUV4MPEG2, uncompressed) decode — header parse,
  YUV420/444 planes, vectorized BT.601 -> RGB — and REAL animated-GIF
  frame sampling (transparency + disposal compositing), both with even
  frame sampling and resize; compressed codecs raise unless
  ``fake=True``.

The Ray-side plumbing — schema, actor-pool signature, batch sizing,
output layout — is identical for real and fake decode paths.

Batch-size guidance (SCALE.md): binary payloads dominate memory; size
``batch_size`` so ``batch_size x concurrency x payload`` fits the worker
heap (e.g. 32 rows for ~4 MB images at 8 actors/32 GB).
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: seed from payload bytes."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """(H, W, 3) -> (h, w, 3) nearest-neighbor, pure indexing."""
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys[:, None], xs[None, :]]


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: P6 <w> <h> <maxval> then raw RGB; '#' comments allowed
    toks: list[bytes] = []
    pos = 2
    while len(toks) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end:end + 1].isspace():
            end += 1
        toks.append(payload[pos:end])
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    arr = np.frombuffer(payload, np.uint8, h * w * 3, pos)
    return arr.reshape(h, w, 3)


def _paeth_row(rr: np.ndarray, prior: np.ndarray,
               bpp: int) -> np.ndarray:
    """Unfilter one Paeth scanline: the left-neighbour dependence is
    inherently sequential along x, so loop pixels but keep every lane
    (channel) vectorized per step. rr/prior: (w, bpp) uint8."""
    w = rr.shape[0]
    cur = np.empty((w, bpp), np.uint8)
    b = prior.astype(np.int16)
    a = np.zeros(bpp, np.int16)   # left
    c = np.zeros(bpp, np.int16)   # upper-left
    for x in range(w):
        p = a + b[x] - c
        pa = np.abs(p - a)
        pb = np.abs(p - b[x])
        pc = np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a,
                        np.where(pb <= pc, b[x], c))
        cur[x] = (rr[x].astype(np.int16) + pred).astype(np.uint8)
        c = b[x]
        a = cur[x].astype(np.int16)
    return cur


def _unfilter_image(buf: np.ndarray, w: int, h: int,
                    nch: int) -> np.ndarray:
    """Filtered scanline bytes -> (h, w, nch) uint8 (PNG filters 0-4).
    None/Sub/Up run whole-row vectorized (Sub is a per-lane cumsum in a
    wrapping uint8 accumulator); Average/Paeth have a true
    left-neighbour recurrence, so they loop pixels with the channel
    lanes vectorized per step."""
    stride = w * nch
    if len(buf) != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    rows = buf.reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:]
    out = np.empty((h, stride), np.uint8)
    prior = np.zeros(stride, np.uint8)
    for y in range(h):
        f, r = int(filters[y]), data[y]
        if f == 0:
            cur = r.copy()
        elif f == 1:    # Sub: per-lane prefix sum, wrapping uint8
            cur = np.cumsum(r.reshape(w, nch), axis=0,
                            dtype=np.uint8).reshape(stride)
        elif f == 2:    # Up
            cur = prior + r   # uint8 wraps
        elif f == 3:    # Average: left-recurrence, lanes vectorized
            rr = r.reshape(w, nch)
            pr = prior.reshape(w, nch).astype(np.int16)
            cw = np.empty((w, nch), np.uint8)
            left = np.zeros(nch, np.int16)
            for x in range(w):
                cw[x] = (rr[x].astype(np.int16)
                         + ((left + pr[x]) >> 1)).astype(np.uint8)
                left = cw[x].astype(np.int16)
            cur = cw.reshape(stride)
        elif f == 4:    # Paeth
            cur = _paeth_row(r.reshape(w, nch),
                             prior.reshape(w, nch), nch).reshape(stride)
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = prior = cur
    return out.reshape(h, w, nch)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (H, W, 3) uint8 RGB — pure stdlib ``zlib`` inflate +
    numpy unfiltering, no codec library (the container has none).

    Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), filters 0-4, non-interlaced AND Adam7
    interlaced. Alpha is dropped (decode target is an RGB tensor).
    16-bit depth raises — honestly, like the JPEG path. Filter kernels:
    see ``_unfilter_image``."""
    import zlib
    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln   # length + type + data + crc
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, interlace = ihdr[8], ihdr[9], ihdr[12]
    if depth != 8:
        raise NotImplementedError(
            f"PNG bit depth {depth} (only 8-bit decodes)")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"invalid PNG color type {ctype}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:          # truncated/corrupt IDAT
        raise ValueError(f"corrupt PNG stream: {e}") from None
    if not interlace:
        px = _unfilter_image(np.frombuffer(raw, np.uint8), w, h, nch)
    else:   # Adam7: 7 independently-filtered sub-images, scattered
        px = np.empty((h, w, nch), np.uint8)
        buf = np.frombuffer(raw, np.uint8)
        pos = 0
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                               (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            need = ph * (pw * nch + 1)
            sub = _unfilter_image(buf[pos:pos + need], pw, ph, nch)
            pos += need
            px[y0::dy, x0::dx] = sub
        if pos != len(buf):
            raise ValueError("PNG interlaced scanline size mismatch")
    if ctype == 2:
        return px
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return pal[idx]
    # gray / gray+alpha -> replicate the luma channel
    return np.repeat(px[:, :, :1], 3, axis=2)


def _lzw_decode(data: bytes, min_code_size: int,
                expected: int) -> bytearray:
    """GIF-variant LZW -> index stream (stops at ``expected`` pixels).
    Codes grow 3..12 bits; CLEAR resets the table; per-code Python loop
    (LZW's chained dictionary is inherently serial) over a numpy-free
    hot path kept tight with bytes concatenation."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return out
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a -> (H, W, 3) uint8 RGB of the FIRST frame (animated
    GIFs: later frames ignored — the frame-sampling stage semantics).
    Pure stdlib+numpy: header/descriptor parse, LZW decode, optional
    interlace deshuffle, palette gather. Frames smaller than the screen
    composite onto the background color."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        return _decode_gif_inner(payload)
    except IndexError:
        raise ValueError("truncated GIF") from None


def _decode_gif_inner(payload: bytes) -> np.ndarray:
    return _gif_frames(payload, keep={0}, max_frames=1)[0]


def decode_gif_frames(payload: bytes, n_frames: int,
                      size: tuple[int, int] | None = None) -> np.ndarray:
    """Animated GIF -> (n_frames, H, W, 3) uint8 RGB, frames sampled
    evenly across the animation (Y4M-compatible contract for the video
    stage). Compositing honors per-frame transparency and disposal
    methods 0/1 (keep), 2 (restore background) and 3 (restore
    previous); a short animation repeats its last frame to fill."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        total = _gif_frame_count(payload)
        # identical sampling + tail-fill contract as decode_y4m_frames;
        # every frame must still be DECODED (compositing is sequential)
        # but only the sampled ones are COPIED and retained - a long
        # animation costs one canvas, not frames x H x W x 3
        take = np.linspace(0, total - 1, min(n_frames, total),
                           dtype=np.int64)
        frames = _gif_frames(payload, keep={int(i) for i in take})
    except IndexError:
        raise ValueError("truncated GIF") from None
    out = np.stack([frames[int(i)] for i in take])
    if len(take) < n_frames:   # short animation: repeat the last frame
        out = np.concatenate(
            [out, np.repeat(out[-1:], n_frames - len(take), axis=0)])
    if size is not None:
        out = np.stack([_resize_nearest(f, size[0], size[1])
                        for f in out])
    return out


def _gif_frame_count(payload: bytes) -> int:
    """Count image descriptors with a cheap block walk (no LZW)."""
    pos = 13
    if payload[10] & 0x80:
        pos += 3 * (2 << (payload[10] & 0x07))
    count = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        iflags = payload[pos + 9]
        pos += 10
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1                              # LZW min code size
        while payload[pos]:
            pos += 1 + payload[pos]
        pos += 1
        count += 1
    if count == 0:
        raise ValueError("GIF contains no image data")
    return count


def _gif_frames(payload: bytes, keep: set | None = None,
                max_frames: int | None = None) -> dict[int, np.ndarray]:
    """Sequential frame decode + composite -> {frame_index: full-screen
    (H, W, 3) frame} for the retained indices (``keep=None`` keeps
    all). Every frame is decoded (compositing is sequential) but only
    retained ones are copied."""
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg = payload[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    # spec: the background index refers to the GLOBAL color table
    bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
              else np.zeros(3, np.uint8))
    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:] = bg_rgb
    frames: dict[int, np.ndarray] = {}
    n_seen = 0
    disposal, t_idx = 0, -1
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:                         # trailer
            break
        if b == 0x21:                         # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:   # graphic control
                gce = payload[pos + 1:pos + 1 + payload[pos]]
                disposal = (gce[0] >> 2) & 0x07
                t_idx = gce[3] if gce[0] & 0x01 else -1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left = int.from_bytes(payload[pos + 1:pos + 3], "little")
        top = int.from_bytes(payload[pos + 3:pos + 5], "little")
        w = int.from_bytes(payload[pos + 5:pos + 7], "little")
        h = int.from_bytes(payload[pos + 7:pos + 9], "little")
        iflags = payload[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:                     # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload, np.uint8, 3 * n,
                                pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        mcs = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(b"".join(chunks), mcs, w * h), np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        idx = idx[:w * h].reshape(h, w)
        if iflags & 0x40:                     # interlaced: deshuffle
            de = np.empty_like(idx)
            rows = np.concatenate([np.arange(0, h, 8),
                                   np.arange(4, h, 8),
                                   np.arange(2, h, 4),
                                   np.arange(1, h, 2)])
            de[rows] = idx
            idx = de
        oob = idx >= len(pal)
        prev = (canvas.copy() if disposal == 3 else None)
        region = canvas[top:top + h, left:left + w]
        if t_idx >= 0:
            # the transparent index is never looked up in the palette,
            # so it may legally exceed the table (r5 review finding)
            if (oob & (idx != t_idx)).any():
                raise ValueError("GIF palette index out of range")
            rgb = pal[np.minimum(idx, len(pal) - 1)]
            opaque = idx != t_idx             # transparent pixels keep
            region[opaque] = rgb[opaque]      # the canvas underneath
        else:
            if oob.any():
                raise ValueError("GIF palette index out of range")
            region[:] = pal[idx]
        if keep is None or n_seen in keep:
            frames[n_seen] = canvas.copy()
        n_seen += 1
        if max_frames is not None and n_seen >= max_frames:
            return frames
        if disposal == 2:                     # restore background
            canvas[top:top + h, left:left + w] = bg_rgb
        elif disposal == 3:                   # restore previous
            canvas = prev
        disposal, t_idx = 0, -1               # GCE applies to ONE image
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (H, W, 3) uint8."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if comp not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    if comp == 3:
        # BI_BITFIELDS: only the standard BGRA masks decode with the
        # fixed BGR(A)->RGB swizzle below; anything else must fail
        # loudly, not silently swap channels
        masks = [int.from_bytes(payload[54 + 4 * i:58 + 4 * i], "little")
                 for i in range(3)]
        if masks != [0x00FF0000, 0x0000FF00, 0x000000FF]:
            raise ValueError(
                f"unsupported BMP channel masks {[hex(m) for m in masks]}"
                f" (only standard BGRA bitfields decode)")
    flip = h > 0
    h = abs(h)
    nchan = bpp // 8
    row_bytes = (w * nchan + 3) & ~3
    arr = np.frombuffer(payload, np.uint8, row_bytes * h, data_off)
    arr = arr.reshape(h, row_bytes)[:, :w * nchan].reshape(h, w, nchan)
    rgb = arr[:, :, 2::-1]  # BGR(A) -> RGB
    return rgb[::-1] if flip else rgb


def _frame_rms(samples: np.ndarray, n_frames: int) -> np.ndarray:
    """Samples in [-1, 1] -> n_frames per-frame RMS (float32)."""
    if not len(samples):
        return np.zeros(n_frames, np.float32)
    # trim so frames divide evenly, then vectorized per-frame RMS
    per = max(len(samples) // n_frames, 1)
    trimmed = samples[:per * n_frames]
    if len(trimmed) < per * n_frames:
        trimmed = np.pad(trimmed, (0, per * n_frames - len(trimmed)))
    return np.sqrt((trimmed.reshape(n_frames, per) ** 2)
                   .mean(axis=1)).astype(np.float32)


def decode_wav_energies(payload: bytes, n_frames: int) -> np.ndarray:
    """WAV/PCM -> n_frames per-frame RMS energies in [0, 1] (float32)."""
    import wave
    with wave.open(io.BytesIO(payload)) as wf:
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, np.uint8).astype(np.float64)
                   - 128.0) / 128.0
    elif width == 4:
        samples = np.frombuffer(raw, np.int32).astype(np.float64) / 2 ** 31
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return _frame_rms(samples, n_frames)


def decode_flac_energies(payload: bytes, n_frames: int) -> np.ndarray:
    """FLAC -> n_frames per-frame RMS energies (speech-corpus path)."""
    from tantivy4java_ray.stages.flac import decode_flac
    samples, _rate = decode_flac(payload)
    return _frame_rms(samples, n_frames)


def decode_y4m_frames(payload: bytes, n_frames: int,
                      size: tuple[int, int] | None = None) -> np.ndarray:
    """YUV4MPEG2 (.y4m, uncompressed video) -> (n_frames, H, W, 3) uint8
    RGB, frames sampled evenly across the stream. Pure numpy: header
    parse, YUV420/444 planes, vectorized BT.601 conversion."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    hdr_end = payload.index(b"\n")
    w = h = 0
    cs = b"420"
    for tok in payload[9:hdr_end].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cs = tok[1:]
    if not (w and h):
        raise ValueError("y4m header missing W/H")
    # EXACT 8-bit colorspaces only: C420p10/C420p16 (2 bytes/sample)
    # would half-size fsz, misalign the FRAME scan, and decode garbage
    if cs in (b"420", b"420jpeg", b"420mpeg2", b"420paldv"):
        fsz, full = w * h * 3 // 2, False
    elif cs == b"444":
        fsz, full = w * h * 3, True
    else:
        raise ValueError(f"unsupported y4m colorspace {cs!r}")
    # frames: b"FRAME[params]\n" + fsz bytes, back to back
    offs = []
    pos = hdr_end + 1
    while pos < len(payload) and payload.startswith(b"FRAME", pos):
        data_at = payload.index(b"\n", pos) + 1
        offs.append(data_at)
        pos = data_at + fsz
    if not offs:
        raise ValueError("y4m stream has no frames")
    take = np.linspace(0, len(offs) - 1, min(n_frames, len(offs)),
                       dtype=np.int64)
    out_h, out_w = size or (h, w)
    out = np.empty((len(take), out_h, out_w, 3), np.uint8)
    for oi, fi in enumerate(take):
        at = offs[fi]
        y = np.frombuffer(payload, np.uint8, w * h, at).reshape(h, w)
        if full:
            u = np.frombuffer(payload, np.uint8, w * h,
                              at + w * h).reshape(h, w)
            v = np.frombuffer(payload, np.uint8, w * h,
                              at + 2 * w * h).reshape(h, w)
        else:
            hw, hh = w // 2, h // 2
            u = np.frombuffer(payload, np.uint8, hw * hh,
                              at + w * h).reshape(hh, hw)
            v = np.frombuffer(payload, np.uint8, hw * hh,
                              at + w * h + hw * hh).reshape(hh, hw)
            u = u.repeat(2, 0).repeat(2, 1)[:h, :w]
            v = v.repeat(2, 0).repeat(2, 1)[:h, :w]
        # BT.601 full-range YUV -> RGB, vectorized
        yf = y.astype(np.float32)
        uf = u.astype(np.float32) - 128.0
        vf = v.astype(np.float32) - 128.0
        rgb = np.stack([yf + 1.402 * vf,
                        yf - 0.344136 * uf - 0.714136 * vf,
                        yf + 1.772 * uf], axis=-1)
        frame = np.clip(rgb, 0, 255).astype(np.uint8)
        out[oi] = _resize_nearest(frame, out_h, out_w)
    if len(take) < n_frames:  # short stream: repeat the last frame
        out = np.concatenate(
            [out, np.repeat(out[-1:], n_frames - len(take), axis=0)])
    return out


class ImageDecodeResize:
    """binary 'image' -> fixed-size uint8 RGB tensor + basic metadata.

    Actor-pool stage: decoder state (target size, library handles) is set
    up once per actor in ``__init__``; use
    ``map_batches(ImageDecodeResize, fn_constructor_kwargs=...,
    batch_size=32, concurrency=(1, N))``.
    """

    def __init__(self, col: str = "image", id_col: str = "doc_id",
                 size: tuple[int, int] = (224, 224), fake: bool = False):
        self.col, self.id_col = col, id_col
        self.h, self.w = size
        self.fake = fake

    def _decode_real(self, payload: bytes) -> np.ndarray:
        if not payload:
            # name the real problem; the codec NotImplementedError below
            # would blame JPEG/PNG for a null/empty cell
            raise ValueError(
                f"null/empty {self.col!r} payload — filter null rows "
                f"before the decode stage or use fake=True")
        if payload.startswith(b"P6"):
            return _resize_nearest(decode_ppm(payload), self.h, self.w)
        if payload.startswith(b"BM"):
            return _resize_nearest(decode_bmp(payload), self.h, self.w)
        if payload.startswith(b"\x89PNG"):
            return _resize_nearest(decode_png(payload), self.h, self.w)
        if payload.startswith(b"\xff\xd8"):
            from tantivy4java_ray.stages.jpeg import decode_jpeg
            return _resize_nearest(decode_jpeg(payload), self.h, self.w)
        if payload.startswith(b"GIF8"):
            return _resize_nearest(decode_gif(payload), self.h, self.w)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from tantivy4java_ray.stages.vp8l import decode_webp
            return _resize_nearest(decode_webp(payload), self.h, self.w)
        raise NotImplementedError(
            "lossy-WebP(VP8)/AVIF decode requires PIL/opencv (not in "
            "this container); JPEG (baseline+progressive), PNG, GIF, "
            "lossless WebP (VP8L), PPM and BMP decode natively, or "
            "construct with fake=True for the deterministic stand-in")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column(self.col).to_pylist()
        out = np.empty((len(payloads), self.h, self.w, 3), np.uint8)
        n_bytes = np.zeros(len(payloads), np.int64)
        for i, p in enumerate(payloads):
            p = p or b""
            n_bytes[i] = len(p)
            out[i] = (_fake_pixels(p, self.h, self.w) if self.fake
                      else self._decode_real(p))
        return pa.table({
            self.id_col: t.column(self.id_col),
            "pixels": pa.FixedSizeListArray.from_arrays(
                pa.array(out.ravel(), pa.uint8()), self.h * self.w * 3),
            "height": pa.array(np.full(len(payloads), self.h, np.int32)),
            "width": pa.array(np.full(len(payloads), self.w, np.int32)),
            "orig_bytes": pa.array(n_bytes)})


class AudioFrameSample:
    """binary 'audio' -> sampled frame energies (float32 list) + metadata."""

    def __init__(self, col: str = "audio", id_col: str = "doc_id",
                 n_frames: int = 16, fake: bool = False):
        self.col, self.id_col = col, id_col
        self.n_frames = n_frames
        self.fake = fake

    def _decode_real(self, payload: bytes) -> np.ndarray:
        if not payload:
            raise ValueError(
                f"null/empty {self.col!r} payload — filter null rows "
                f"before the decode stage or use fake=True")
        if payload.startswith(b"RIFF"):
            return decode_wav_energies(payload, self.n_frames)
        if payload.startswith(b"fLaC"):
            return decode_flac_energies(payload, self.n_frames)
        raise NotImplementedError(
            "MP3/OGG audio requires soundfile/ffmpeg (not in this "
            "container); WAV/PCM and FLAC decode natively, or "
            "construct with fake=True for the deterministic stand-in")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column(self.col).to_pylist()
        frames = np.empty((len(payloads), self.n_frames), np.float32)
        for i, p in enumerate(payloads):
            p = p or b""
            if self.fake:
                seed = int.from_bytes(p[:8].ljust(8, b"\0"), "little")
                frames[i] = np.random.default_rng(seed).random(
                    self.n_frames, np.float32)
            else:
                frames[i] = self._decode_real(p)
        return pa.table({
            self.id_col: t.column(self.id_col),
            "frame_energy": pa.FixedSizeListArray.from_arrays(
                pa.array(frames.ravel(), pa.float32()), self.n_frames),
            "orig_bytes": pa.array(
                np.array([len(p or b"") for p in payloads], np.int64))})


class VideoFrameSample:
    """binary 'video' -> n sampled RGB frames (fixed-size uint8 tensor)
    + metadata. Y4M (uncompressed) decodes natively; compressed codecs
    (H.264/VP9) raise unless ``fake=True``. Batch-size guidance: videos
    are the largest payloads — keep ``batch_size`` small (4-8) and let
    the actor pool provide the parallelism."""

    def __init__(self, col: str = "video", id_col: str = "doc_id",
                 n_frames: int = 8, size: tuple[int, int] = (64, 64),
                 fake: bool = False):
        self.col, self.id_col = col, id_col
        self.n_frames = n_frames
        self.h, self.w = size
        self.fake = fake

    def _decode_real(self, payload: bytes) -> np.ndarray:
        if not payload:
            raise ValueError(
                f"null/empty {self.col!r} payload — filter null rows "
                f"before the decode stage or use fake=True")
        if payload.startswith(b"YUV4MPEG2"):
            return decode_y4m_frames(payload, self.n_frames,
                                     (self.h, self.w))
        if payload.startswith(b"GIF8"):      # the web's animation format
            return decode_gif_frames(payload, self.n_frames,
                                     (self.h, self.w))
        raise NotImplementedError(
            "compressed video codecs (H.264/VP9/AV1) require ffmpeg (not "
            "in this container); Y4M and animated GIF decode natively, "
            "or construct with fake=True for the deterministic stand-in")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column(self.col).to_pylist()
        n = len(payloads)
        out = np.empty((n, self.n_frames, self.h, self.w, 3), np.uint8)
        n_bytes = np.zeros(n, np.int64)
        for i, p in enumerate(payloads):
            p = p or b""
            n_bytes[i] = len(p)
            if self.fake:
                for f in range(self.n_frames):
                    # frame byte FIRST: _fake_pixels seeds from the
                    # leading 8 bytes, so a suffix would be ignored for
                    # any payload >= 8 B and every frame would be equal
                    out[i, f] = _fake_pixels(bytes([f]) + p, self.h, self.w)
            else:
                out[i] = self._decode_real(p)
        per = self.n_frames * self.h * self.w * 3
        return pa.table({
            self.id_col: t.column(self.id_col),
            "frames": pa.FixedSizeListArray.from_arrays(
                pa.array(out.ravel(), pa.uint8()), per),
            "n_frames": pa.array(np.full(n, self.n_frames, np.int32)),
            "height": pa.array(np.full(n, self.h, np.int32)),
            "width": pa.array(np.full(n, self.w, np.int32)),
            "orig_bytes": pa.array(n_bytes)})


def decode_images(ds, *, col: str = "image", id_col: str = "doc_id",
                  size=(224, 224), fake: bool = False, batch_size: int = 32,
                  concurrency: int = 4):
    return ds.map_batches(
        ImageDecodeResize,
        fn_constructor_kwargs=dict(col=col, id_col=id_col, size=size,
                                   fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1)


def sample_audio_frames(ds, *, col: str = "audio", id_col: str = "doc_id",
                        n_frames: int = 16, fake: bool = False,
                        batch_size: int = 64, concurrency: int = 4):
    return ds.map_batches(
        AudioFrameSample,
        fn_constructor_kwargs=dict(col=col, id_col=id_col,
                                   n_frames=n_frames, fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1)


def sample_video_frames(ds, *, col: str = "video", id_col: str = "doc_id",
                        n_frames: int = 8, size=(64, 64),
                        fake: bool = False, batch_size: int = 8,
                        concurrency: int = 4):
    return ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs=dict(col=col, id_col=id_col,
                                   n_frames=n_frames, size=size, fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1)
