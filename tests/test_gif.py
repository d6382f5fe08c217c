"""GIF decoder golden tests: a reference LZW encoder (which mirrors the
DECODER's code-width schedule by simulating its table growth —
the classic GIF off-by-one trap) writes real GIF87a/89a streams; decode
must return exact palette-mapped pixels. GIF is lossless, so every test
is exact."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tantivy4java_ray.stages.multimodal import (ImageDecodeResize,
                                                decode_gif)


class _LSBWriter:
    """GIF packs LZW codes least-significant-bit first."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def lzw_encode(indices: bytes, mcs: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    w = _LSBWriter()
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    dec_len = end + 1         # decoder table length, simulated exactly
    first_after_reset = True

    def emit(code: int):
        nonlocal width, dec_len, first_after_reset
        w.put(code, width)
        # decoder appends one entry per code EXCEPT the first after a
        # clear, then widens when its table reaches 2^width
        if code == clear:
            dec_len = end + 1
            width = mcs + 1
            first_after_reset = True
            return
        if first_after_reset:
            first_after_reset = False
        elif dec_len < 4096:
            dec_len += 1
        if dec_len >= (1 << width) and width < 12:
            width += 1

    emit(clear)
    cur = b""
    for ch in indices:
        nxt = cur + bytes([ch])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        else:                 # table full: clear and restart
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        cur = bytes([ch])
    if cur:
        emit(table[cur])
    emit(end)
    return w.flush()


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(idx: np.ndarray, palette: np.ndarray, *,
               interlace: bool = False, local_palette: bool = False,
               extra_frame: bool = False, version: bytes = b"GIF89a",
               left: int = 0, top: int = 0,
               screen: tuple[int, int] | None = None) -> bytes:
    """(H, W) palette indices + (N, 3) palette -> GIF bytes."""
    h, w = idx.shape
    sw, sh = screen or (w + left, h + top)
    n = len(palette)
    bits = max((n - 1).bit_length(), 1)
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[:n] = palette
    out = bytearray(version)
    gflags = (0x80 | (bits - 1)) if not local_palette else 0x00
    out += int(sw).to_bytes(2, "little") + int(sh).to_bytes(2, "little")
    out += bytes([gflags, 0, 0])
    if not local_palette:
        out += pal.tobytes()
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"   # GCE (ignored)
    rows = idx
    if interlace:
        order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                np.arange(2, h, 4), np.arange(1, h, 2)])
        rows = idx[order]
    iflags = (0x40 if interlace else 0) | \
        ((0x80 | (bits - 1)) if local_palette else 0)
    mcs = max(bits, 2)
    out += b"\x2c" + int(left).to_bytes(2, "little") \
        + int(top).to_bytes(2, "little") \
        + int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little") \
        + bytes([iflags])
    if local_palette:
        out += pal.tobytes()
    out += bytes([mcs]) + _subblocks(
        lzw_encode(rows.astype(np.uint8).tobytes(), mcs))
    if extra_frame:   # animated: a second frame the decoder must ignore
        out += b"\x2c" + b"\x00\x00\x00\x00" \
            + int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little") \
            + bytes([0x00]) + bytes([mcs]) + _subblocks(
                lzw_encode(bytes(h * w), mcs))
    out += b"\x3b"
    return bytes(out)


@pytest.mark.parametrize("shape,ncolor", [
    ((8, 8), 4), ((13, 21), 16), ((40, 33), 256), ((1, 1), 2),
    ((64, 64), 256),
])
def test_roundtrip(shape, ncolor):
    rng = np.random.default_rng(shape[0] * 7 + ncolor)
    pal = rng.integers(0, 256, (ncolor, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolor, shape, dtype=np.uint8)
    got = decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_repetitive_data_exercises_table_growth():
    # long repeats drive LZW entries (and code-width bumps) hard
    pal = np.asarray([[0, 0, 0], [255, 255, 255], [9, 9, 9], [1, 2, 3]],
                     np.uint8)
    idx = np.tile(np.asarray([[0, 0, 1, 1, 2, 2, 3, 3]], np.uint8),
                  (100, 50))[:100, :210]
    got = decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_table_full_clear_restart():
    # enough distinct patterns to hit code 4096 and force a mid-stream
    # CLEAR from the encoder; decoder must resync
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (120, 120), dtype=np.uint8)
    got = decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_interlace_and_local_palette_and_87a():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (23, 11), dtype=np.uint8)
    for kw in (dict(interlace=True), dict(local_palette=True),
               dict(version=b"GIF87a"), dict(extra_frame=True)):
        got = decode_gif(encode_gif(idx, pal, **kw))
        np.testing.assert_array_equal(got, pal[idx], err_msg=str(kw))


def test_frame_smaller_than_screen_composites_on_bg():
    pal = np.asarray([[10, 20, 30], [200, 100, 0]], np.uint8)
    idx = np.ones((2, 3), np.uint8)
    got = decode_gif(encode_gif(idx, pal, left=2, top=1, screen=(8, 6)))
    assert got.shape == (6, 8, 3)
    np.testing.assert_array_equal(got[1:3, 2:5], pal[idx])
    np.testing.assert_array_equal(got[0, 0], pal[0])   # bg color 0


def test_rejections():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG....")
    pal = np.asarray([[1, 2, 3]], np.uint8)
    good = encode_gif(np.zeros((2, 2), np.uint8), pal)
    with pytest.raises(ValueError):
        decode_gif(good[:20])   # truncated


def test_image_stage_decodes_gif_end_to_end(ray_session):
    import ray.data
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    imgs = [rng.integers(0, 32, (20, 14), dtype=np.uint8)
            for _ in range(4)]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "image": [encode_gif(i, pal) for i in imgs]})
    out = (ray.data.from_arrow(pa.Table.from_pandas(df))
           .map_batches(ImageDecodeResize,
                        fn_constructor_kwargs=dict(size=(10, 10)),
                        batch_size=2, concurrency=1,
                        batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.shape[0] == 4 and (out["height"] == 10).all()


def test_local_palette_subframe_composites_global_bg():
    """Background index refers to the GLOBAL palette even when the
    frame uses a local one (r5 review finding: pal[bg] vs gct[bg])."""
    gpal = np.asarray([[11, 22, 33], [200, 0, 0]], np.uint8)
    lpal = np.asarray([[0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.ones((2, 2), np.uint8)
    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += (6).to_bytes(2, "little") + (5).to_bytes(2, "little")
    out += bytes([0x80 | 0, 0, 0])            # GCT, bg index 0
    out += gpal.tobytes()
    out += b"\x2c" + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x80 | 0])                  # local color table
    out += lpal.tobytes()
    out += bytes([2]) + _subblocks(lzw_encode(idx.tobytes(), 2)) + b"\x3b"
    got = decode_gif(bytes(out))
    assert got.shape == (5, 6, 3)
    np.testing.assert_array_equal(got[0, 0], gpal[0])   # global bg
    np.testing.assert_array_equal(got[1:3, 1:3],
                                  np.tile(lpal[1], (2, 2, 1)))


def encode_gif_anim(frames, palette, *, t_idx=None, disposal=0,
                    sub=None) -> bytes:
    """Multi-frame GIF: full-screen frames (or ``sub`` rects), one GCE
    per frame carrying transparency index + disposal method."""
    h, w = frames[0].shape
    n = len(palette)
    bits = max((n - 1).bit_length(), 1)
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[:n] = palette
    mcs = max(bits, 2)
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0]) + pal.tobytes()
    for fi, fr in enumerate(frames):
        gflags = (disposal << 2) | (1 if t_idx is not None else 0)
        out += bytes([0x21, 0xF9, 4, gflags, 0, 0,
                      t_idx if t_idx is not None else 0, 0])
        if sub and fi > 0:
            (left, top, fw, fh) = sub
            body = fr[top:top + fh, left:left + fw]
        else:
            left = top = 0
            fh, fw = fr.shape
            body = fr
        out += b"\x2c" + int(left).to_bytes(2, "little") \
            + int(top).to_bytes(2, "little") \
            + int(fw).to_bytes(2, "little") + int(fh).to_bytes(2, "little") \
            + bytes([0x00]) + bytes([mcs]) \
            + _subblocks(lzw_encode(body.astype(np.uint8).tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


def test_animated_frame_sampling_and_transparency():
    from tantivy4java_ray.stages.multimodal import decode_gif_frames
    pal = np.asarray([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                     np.uint8)
    # 4 full-screen frames painted solid 0,1,2,3
    frames = [np.full((6, 6), c, np.uint8) for c in range(4)]
    payload = encode_gif_anim(frames, pal)
    got = decode_gif_frames(payload, 4)
    for c in range(4):
        np.testing.assert_array_equal(got[c], np.tile(pal[c], (6, 6, 1)))
    # sample 2 of 4: first and last
    got2 = decode_gif_frames(payload, 2)
    np.testing.assert_array_equal(got2[0], got[0])
    np.testing.assert_array_equal(got2[1], got[3])
    # transparency: index 0 transparent -> frame 2's 0-pixels show
    # frame 1's color underneath
    f1 = np.full((4, 4), 1, np.uint8)
    f2 = np.full((4, 4), 0, np.uint8)
    f2[0, 0] = 2
    payload = encode_gif_anim([f1, f2], pal, t_idx=0)
    got = decode_gif_frames(payload, 2)
    np.testing.assert_array_equal(got[1][0, 0], pal[2])
    np.testing.assert_array_equal(got[1][1, 1], pal[1])   # underneath


def test_animated_disposal_background_and_previous():
    # the reference encoder attaches the SAME disposal GCE to every
    # frame (incl. the first), so expectations follow that uniform
    # semantics — which still pins both disposal paths
    from tantivy4java_ray.stages.multimodal import decode_gif_frames
    pal = np.asarray([[9, 9, 9], [255, 0, 0], [0, 255, 0]], np.uint8)
    base = np.full((5, 5), 1, np.uint8)
    patch = np.full((5, 5), 2, np.uint8)
    # disposal 2: every frame's rect restores to bg (pal[0]) after it
    # shows; frames 2 and 3 are 2x2 sub-rects at (1,1)
    payload = encode_gif_anim([base, patch, base], pal, disposal=2,
                              sub=(1, 1, 2, 2))
    got = decode_gif_frames(payload, 3)
    np.testing.assert_array_equal(got[0], np.tile(pal[1], (5, 5, 1)))
    np.testing.assert_array_equal(got[1][1, 1], pal[2])   # patch visible
    np.testing.assert_array_equal(got[1][0, 0], pal[0])   # f1 restored
    np.testing.assert_array_equal(got[2][1, 1], pal[1])   # rect redrawn
    np.testing.assert_array_equal(got[2][4, 4], pal[0])   # still bg
    # disposal 3: restore PREVIOUS canvas after each frame — frame 1's
    # full-screen red is rolled back before frame 2, so frames 2 and 3
    # composite their 2x2 rect onto the pristine bg canvas
    payload = encode_gif_anim([base, patch, patch], pal, disposal=3,
                              sub=(0, 0, 2, 2))
    got = decode_gif_frames(payload, 3)
    np.testing.assert_array_equal(got[0], np.tile(pal[1], (5, 5, 1)))
    np.testing.assert_array_equal(got[2][0, 0], pal[2])
    np.testing.assert_array_equal(got[2][4, 4], pal[0])


def test_video_stage_decodes_gif_end_to_end(ray_session):
    import ray.data
    from tantivy4java_ray.stages.multimodal import VideoFrameSample
    pal = np.asarray([[0, 0, 0], [255, 255, 255]], np.uint8)
    frames = [np.full((10, 8), i % 2, np.uint8) for i in range(6)]
    payload = encode_gif_anim(frames, pal)
    df = pd.DataFrame({"doc_id": np.asarray([0], np.int64),
                       "video": [payload]})
    out = (ray.data.from_arrow(pa.Table.from_pandas(df))
           .map_batches(VideoFrameSample,
                        fn_constructor_kwargs=dict(n_frames=3,
                                                   size=(4, 4)),
                        batch_size=1, concurrency=1,
                        batch_format="pyarrow")
           .to_pandas())
    assert out.shape[0] == 1
    fr = np.asarray(out["frames"].iloc[0] if "frames" in out.columns
                    else out.iloc[0, 1])
    assert fr.size == 3 * 4 * 4 * 3


def test_short_animation_fills_with_last_frame():
    """Y4M-identical fill contract: a 2-frame GIF sampled at n=5 yields
    [f0, f1, f1, f1, f1] — real frames first, last repeated (r5 review
    finding: linspace-rounding spread duplicates through the sequence)."""
    from tantivy4java_ray.stages.multimodal import decode_gif_frames
    pal = np.asarray([[1, 1, 1], [200, 200, 200]], np.uint8)
    frames = [np.full((3, 3), 0, np.uint8), np.full((3, 3), 1, np.uint8)]
    got = decode_gif_frames(encode_gif_anim(frames, pal), 5)
    np.testing.assert_array_equal(got[0], np.tile(pal[0], (3, 3, 1)))
    for i in range(1, 5):
        np.testing.assert_array_equal(got[i], np.tile(pal[1], (3, 3, 1)))


def test_transparent_index_beyond_palette():
    """The transparent index may exceed the color table (it is never
    looked up); such frames must decode, not raise."""
    from tantivy4java_ray.stages.multimodal import decode_gif_frames
    pal = np.asarray([[10, 0, 0], [0, 10, 0]], np.uint8)
    f1 = np.zeros((2, 2), np.uint8)
    f2 = np.full((2, 2), 3, np.uint8)       # 3 == transparent, > len(pal)
    f2[0, 0] = 1
    payload = encode_gif_anim([f1, f2], pal, t_idx=3)
    got = decode_gif_frames(payload, 2)
    np.testing.assert_array_equal(got[1][0, 0], pal[1])
    np.testing.assert_array_equal(got[1][1, 1], pal[0])   # shows through
