"""Corrupt-payload robustness: a crawl's image bytes are routinely
truncated or bit-flipped; every decoder must fail CLOSED — a ValueError
or NotImplementedError (which ImageDecodeResize surfaces per row), never
a segfault-ish numpy error, KeyError, OverflowError, or a hang.

Each fuzz case starts from a VALID stream produced by the reference
encoders and applies truncation or byte corruption; decoding either
succeeds (corruption may land in don't-care bytes — e.g. CRCs we don't
verify) or raises one of the two sanctioned error types within a time
budget."""

import numpy as np
import pytest

from tantivy4java_ray.stages.jpeg import decode_jpeg
from tantivy4java_ray.stages.multimodal import (decode_bmp, decode_gif,
                                                decode_gif_frames,
                                                decode_png, decode_ppm)
from tantivy4java_ray.stages.vp8l import decode_webp
from tantivy4java_ray.stages.flac import decode_flac

OK_ERRORS = (ValueError, NotImplementedError)


def _make_valid():
    """One valid payload per codec, via the test reference encoders."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_gif import encode_gif, encode_gif_anim
    from test_jpeg import encode_jpeg, encode_jpeg_progressive
    from test_png import encode_png
    from test_vp8l import encode_vp8l
    from test_flac import encode_flac

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (10, 9), dtype=np.uint8)
    ppm = b"P6\n12 10 255\n" + bytes(rng.integers(
        0, 256, 12 * 10 * 3, dtype=np.uint8))
    bmp_px = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    row = ((6 * 3 + 3) & ~3)
    bmp_body = bytearray()
    for y in range(5, -1, -1):
        line = bmp_px[y, :, ::-1].tobytes()
        bmp_body += line + b"\0" * (row - len(line))
    bmp = (b"BM" + (54 + len(bmp_body)).to_bytes(4, "little")
           + b"\0\0\0\0" + (54).to_bytes(4, "little")
           + (40).to_bytes(4, "little")
           + (6).to_bytes(4, "little") + (6).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + b"\0" * 24 + bytes(bmp_body))
    return {
        "jpeg": encode_jpeg(img, subsample=(2, 2))[0],
        "jpeg_prog": encode_jpeg_progressive(img)[0],
        "png": encode_png(img, 2, [0, 1, 2, 3, 4]),
        "gif": encode_gif(idx, pal),
        "gif_anim": encode_gif_anim(
            [idx, (idx + 1) % 8], pal),
        "ppm": ppm,
        "bmp": bmp,
        "webp": encode_vp8l(img, subtract_green=True, cache_bits=4),
        "flac": encode_flac(
            [(900 * np.sin(np.arange(256) / 9)).astype(np.int64)],
            blocksize=64),
    }


DECODERS = {
    "jpeg": decode_jpeg, "jpeg_prog": decode_jpeg,
    "png": decode_png, "gif": decode_gif,
    "gif_anim": lambda p: decode_gif_frames(p, 3),
    "ppm": decode_ppm, "bmp": decode_bmp, "webp": decode_webp,
    "flac": decode_flac,
}


@pytest.fixture(scope="module")
def valid_payloads():
    return _make_valid()


def test_valid_baselines_decode(valid_payloads):
    for name, payload in valid_payloads.items():
        out = DECODERS[name](payload)
        if name == "flac":
            assert out[0].dtype == np.float64
        else:
            assert out.dtype == np.uint8, name


@pytest.mark.parametrize("codec", sorted(DECODERS))
def test_truncations_fail_closed(valid_payloads, codec):
    payload = valid_payloads[codec]
    fn = DECODERS[codec]
    rng = np.random.default_rng(11)
    cuts = sorted({int(x) for x in
                   rng.integers(0, len(payload), 40)} | {0, 1, 7,
                                                         len(payload) - 1})
    for cut in cuts:
        try:
            fn(payload[:cut])
        except OK_ERRORS:
            pass
        # success is also acceptable: the cut may fall after all
        # semantically-required bytes (e.g. inside trailing markers)


@pytest.mark.parametrize("codec", sorted(DECODERS))
def test_byte_corruption_fails_closed(valid_payloads, codec):
    payload = bytearray(valid_payloads[codec])
    fn = DECODERS[codec]
    rng = np.random.default_rng(13)
    for _ in range(120):
        mut = bytearray(payload)
        for _k in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(mut)))
            mut[pos] = int(rng.integers(0, 256))
        try:
            fn(bytes(mut))
        except OK_ERRORS:
            pass
        # anything else (IndexError, KeyError, OverflowError, zlib
        # errors leaking through, infinite loops) propagates and FAILS


@pytest.mark.parametrize("codec", sorted(DECODERS))
def test_garbage_prefix_rejected(codec):
    fn = DECODERS[codec]
    rng = np.random.default_rng(17)
    for n in (0, 1, 4, 64, 4096):
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        with pytest.raises(OK_ERRORS):
            fn(blob)
