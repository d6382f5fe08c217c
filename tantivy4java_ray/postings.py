"""Posting-list codec: delta-encoded, block-128 bitpacked docIDs + tf blocks
with per-block max metadata (block-max WAND), plus a positions stream.

This is the from-scratch analog of tantivy's posting format (the reference
ships it inside ``.split`` files; ``split/merge/QuickwitSplit.java:164-307``):
doc ids are strictly increasing per term, stored as bitpacked deltas in
blocks of 128 with a skip table carrying ``last_doc`` (skip pointer) and
``max_tf`` (block-max score bound) per block — the metadata block-max WAND
needs (BASELINE.json north_star).

Layout of one term's posting region::

    u32 df | u32 nblocks
    u32 last_doc[nblocks]      # skip pointers
    u32 max_tf [nblocks]       # block-max metadata
    u8  bits_doc[nblocks]      # bit width of doc deltas per block
    u8  bits_tf [nblocks]      # bit width of (tf-1) per block
    data: per block, ceil(cnt*bits_doc/8) delta bytes + ceil(cnt*bits_tf/8)

Block ``i``'s first delta is relative to ``last_doc[i-1]`` (``-1`` for block
0) so any block decodes independently given the skip table. All packing is
little-endian-bit numpy (``np.packbits(bitorder="little")``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK = 128


def _pack(vals: np.ndarray, width: int) -> bytes:
    """Bitpack uint32 values at the given width (little-endian bit order).

    Column-wise bit extraction into a preallocated uint8 matrix — avoids
    the (n, w) uint64 temporaries that dominate for multi-million-entry
    position streams."""
    if width == 0:
        return b""
    v = np.ascontiguousarray(vals, np.uint32)
    bits = np.empty((len(v), width), np.uint8)
    for j in range(width):
        np.bitwise_and(v >> np.uint32(j), 1, out=bits[:, j],
                       casting="unsafe")
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def _unpack(buf: np.ndarray, count: int, width: int) -> np.ndarray:
    """Inverse of ``_pack``; ``buf`` is a uint8 array of the packed bytes.

    Width-hybrid kernel: narrow values (<= 6 bits) decode fastest via
    unpackbits + a tiny matmul; wider values via TWO aligned u64 loads
    per value (value j spans bit j*w: combine a64[j*w>>6] and the next
    word) — no byte-window matrix, so the only copy is the 8-byte-slack
    pad (the previous sliding-window variant materialized an 8x-expanded
    byte matrix; measured 1.2-1.9x slower at w=7..17)."""
    if width == 0:
        return np.zeros(count, dtype=np.uint32)
    if width <= 6:
        bits = np.unpackbits(buf, count=count * width, bitorder="little")
        return (bits.reshape(count, width).astype(np.uint64)
                @ (np.uint64(1) << np.arange(width, dtype=np.uint64))
                ).astype(np.uint32)
    need = (count * width + 7) // 8
    nw = need // 8 + 2
    pad = np.zeros(nw * 8, np.uint8)
    pad[:need] = buf[:need]
    a64 = pad.view(np.uint64)
    bitpos = np.arange(count, dtype=np.int64) * width
    word = bitpos >> 6
    shift = (bitpos & 63).astype(np.uint64)
    lo = a64[word] >> shift
    # (x << 1) << (63 - s) == x << (64 - s) without the s=0 UB
    hi = (a64[word + 1] << np.uint64(1)) << (np.uint64(63) - shift)
    return ((lo | hi) & np.uint64((1 << width) - 1)).astype(np.uint32)


def _width(vals: np.ndarray) -> int:
    if len(vals) == 0:
        return 0
    m = int(vals.max())
    return m.bit_length()


@dataclass
class SkipInfo:
    df: int
    nblocks: int
    last_doc: np.ndarray    # uint32[nblocks]
    max_tf: np.ndarray      # uint32[nblocks]
    bits_doc: np.ndarray    # uint8[nblocks]
    bits_tf: np.ndarray     # uint8[nblocks]
    data_start: int         # offset of packed data within the region
    block_offsets: np.ndarray  # int64[nblocks+1] offsets into data

    def block_count(self, i: int) -> int:
        return BLOCK if i < self.nblocks - 1 else self.df - (self.nblocks - 1) * BLOCK


def _bit_widths(maxes: np.ndarray) -> np.ndarray:
    """Vectorized bit_length of per-block maxima (uint32)."""
    return np.ceil(np.log2(maxes.astype(np.float64) + 1.0)).astype(np.uint8)


def _pack_blocks(mat: np.ndarray, widths: np.ndarray,
                 last_count: int) -> list[bytes]:
    """Pack (nblocks, BLOCK) value rows at per-row widths.

    All same-width rows are packed in ONE ``np.packbits(axis=1)`` call —
    full 128-value blocks are byte-aligned (16*w bytes), and the final
    partial block is zero-padded then sliced to ``ceil(cnt*w/8)``.
    """
    nb = len(mat)
    out: list[bytes] = [b""] * nb
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        sel = np.flatnonzero(widths == w)
        vals = mat[sel].astype(np.uint64)
        bits = ((vals[:, :, None] >> np.arange(w, dtype=np.uint64)) & 1
                ).astype(np.uint8)
        packed = np.packbits(bits.reshape(len(sel), BLOCK * w), axis=1,
                             bitorder="little")
        for j, bi in enumerate(sel):
            cnt = last_count if bi == nb - 1 else BLOCK
            out[bi] = packed[j, :(cnt * w + 7) // 8].tobytes()
    return out


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode one term's posting list. ``doc_ids`` strictly increasing."""
    df = len(doc_ids)
    assert df > 0
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint32)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint32)
    nblocks = (df + BLOCK - 1) // BLOCK

    # global gap-1 deltas; a block's first delta is relative to the
    # previous block's last doc, which IS the previous global doc -> the
    # same value, so no per-block fixup is needed
    deltas = np.empty(df, dtype=np.uint32)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    deltas[1:] -= 1

    if nblocks == 1:
        # the overwhelmingly common case (df <= 128): no block matrices
        tfs1 = tfs - 1
        wd = _width(deltas)
        wt = _width(tfs1)
        header = np.array([df, 1], dtype=np.uint32).tobytes()
        return b"".join([
            header,
            doc_ids[df - 1:df].tobytes(),                # last_doc
            np.array([int(tfs.max())], np.uint32).tobytes(),
            bytes([wd, wt]),
            _pack(deltas, wd), _pack(tfs1, wt)])

    last_count = df - (nblocks - 1) * BLOCK
    flat = np.zeros(nblocks * BLOCK, np.uint32)
    flat[:df] = deltas
    dmat = flat.reshape(nblocks, BLOCK)
    flat_t = np.zeros(nblocks * BLOCK, np.uint32)
    np.subtract(tfs, 1, out=flat_t[:df])
    tmat = flat_t.reshape(nblocks, BLOCK)
    last_doc = doc_ids[np.minimum(np.arange(1, nblocks + 1) * BLOCK - 1,
                                  df - 1)].astype(np.uint32)
    # every block has >= 1 real entry, so block max(tf) = max(tf-1) + 1
    max_tf = (tmat.max(axis=1) + 1).astype(np.uint32)
    bits_doc = _bit_widths(dmat.max(axis=1))
    bits_tf = _bit_widths(tmat.max(axis=1))

    dchunks = _pack_blocks(dmat, bits_doc, last_count)
    tchunks = _pack_blocks(tmat, bits_tf, last_count)
    chunks: list[bytes] = []
    for i in range(nblocks):
        chunks.append(dchunks[i])
        chunks.append(tchunks[i])

    header = np.array([df, nblocks], dtype=np.uint32).tobytes()
    return b"".join([header, last_doc.tobytes(), max_tf.tobytes(),
                     bits_doc.tobytes(), bits_tf.tobytes(), *chunks])


def read_skip(buf: bytes | memoryview, offset: int = 0) -> SkipInfo:
    mv = memoryview(buf)
    df, nblocks = np.frombuffer(mv, np.uint32, 2, offset)
    p = offset + 8
    last_doc = np.frombuffer(mv, np.uint32, nblocks, p); p += 4 * nblocks
    max_tf = np.frombuffer(mv, np.uint32, nblocks, p); p += 4 * nblocks
    bits_doc = np.frombuffer(mv, np.uint8, nblocks, p); p += nblocks
    bits_tf = np.frombuffer(mv, np.uint8, nblocks, p); p += nblocks
    counts = np.full(nblocks, BLOCK, np.int64)
    counts[-1] = df - (nblocks - 1) * BLOCK
    sizes = ((counts * bits_doc + 7) // 8) + ((counts * bits_tf + 7) // 8)
    block_offsets = np.zeros(nblocks + 1, np.int64)
    np.cumsum(sizes, out=block_offsets[1:])
    return SkipInfo(int(df), int(nblocks), last_doc, max_tf, bits_doc,
                    bits_tf, p - offset, block_offsets)


def decode_block(buf: bytes | memoryview, skip: SkipInfo, i: int,
                 base_offset: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Decode block ``i`` -> (doc_ids, tfs)."""
    cnt = skip.block_count(i)
    start = base_offset + skip.data_start + int(skip.block_offsets[i])
    wd, wt = int(skip.bits_doc[i]), int(skip.bits_tf[i])
    nd = (cnt * wd + 7) // 8
    nt = (cnt * wt + 7) // 8
    raw = np.frombuffer(memoryview(buf), np.uint8, nd + nt, start)
    deltas = _unpack(raw[:nd], cnt, wd)
    tfs = _unpack(raw[nd:], cnt, wt) + 1
    prev = np.uint32(skip.last_doc[i - 1] + 1) if i > 0 else np.uint32(0)
    docs = (np.cumsum(deltas.astype(np.uint64) + 1) - 1
            + np.uint64(prev)).astype(np.uint32)
    return docs, tfs


def _unpack_rows(buf, starts: np.ndarray, counts: np.ndarray, w: int
                 ) -> np.ndarray:
    """Unpack many same-width VARIABLE-COUNT regions in one batched pass
    -> values concatenated in row order (``sum(counts)`` total).

    The full-block path packs to a uniform stride so rows concatenate
    into one stream; partial tail blocks have per-row counts, so here
    each row is unpacked independently on a padded 2-D byte matrix and
    the per-row prefixes are masked out at the end. One gather + one
    kernel per width instead of one ``_unpack`` call per tail block."""
    starts = np.asarray(starts, np.int64)
    counts = np.asarray(counts, np.int64)
    if w == 0:
        return np.zeros(int(counts.sum()), np.uint32)
    maxc = int(counts.max())
    nbytes = (maxc * w + 7) // 8
    mv = np.frombuffer(memoryview(buf), np.uint8)
    # clamp the gather so short rows near the buffer end stay in bounds;
    # over-read bytes land only in masked-out positions
    idx = np.minimum(starts[:, None]
                     + np.arange(nbytes + 8, dtype=np.int64)[None, :],
                     len(mv) - 1)
    raw = mv[idx]
    mask = (np.arange(maxc, dtype=np.int64)[None, :] < counts[:, None])
    if w <= 6:
        bits = np.unpackbits(raw[:, :nbytes], axis=1, bitorder="little")
        vals = (bits[:, :maxc * w].reshape(len(starts), maxc, w)
                .astype(np.uint64)
                @ (np.uint64(1) << np.arange(w, dtype=np.uint64))
                ).astype(np.uint32)
        return vals[mask]
    # two aligned u64 loads per value (see _unpack); rows pad to a
    # u64 multiple so the whole matrix views as (nrows, nw) words
    nw = nbytes // 8 + 2
    raw8 = np.zeros((len(starts), nw * 8), np.uint8)
    raw8[:, :raw.shape[1]] = raw
    a64 = raw8.view(np.uint64)
    bitpos = np.arange(maxc, dtype=np.int64) * w
    word = bitpos >> 6
    shift = (bitpos & 63).astype(np.uint64)
    lo = a64[:, word] >> shift[None, :]
    hi = (a64[:, word + 1] << np.uint64(1)) << (np.uint64(63)
                                                - shift)[None, :]
    vals = ((lo | hi) & np.uint64((1 << w) - 1)).astype(np.uint32)
    return vals[mask]


def _gather_unpack(buf, starts: np.ndarray, nbytes: int, w: int,
                   count_per_block: int) -> np.ndarray:
    """Unpack same-width full blocks in one batched unpackbits call.

    The block-byte gather is ONE fancy-index (doc and tf chunks
    interleave in the stream, so blocks of one width are never
    contiguous) — a per-block frombuffer loop dominated hot-term decode
    otherwise. Full 128-value blocks pack to exactly 16*w bytes, so the
    gathered rows concatenate into one CONTIGUOUS uniform-width stream
    (global value j at bitpos j*w) and decode through the same
    width-hybrid kernel as ``_unpack``."""
    mv = np.frombuffer(memoryview(buf), np.uint8)
    idx = (np.asarray(starts, np.int64)[:, None]
           + np.arange(nbytes, dtype=np.int64)[None, :])
    raw = mv[idx]
    return _unpack(raw.ravel(), len(starts) * count_per_block, w)


def decode_postings(buf: bytes | memoryview, offset: int = 0,
                    with_tfs: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Decode a whole posting region -> (doc_ids, tfs).

    Full blocks are decoded grouped by bit width (one unpackbits + one
    matmul per distinct width) — the vectorized inverse of
    ``_pack_blocks``; global gap-1 deltas cumsum straight to doc ids.
    ``with_tfs=False`` skips the tf stream entirely (returns an empty tf
    array) — the const-score union path (automaton/term-set/exists)
    needs only doc ids, and tf unpack is ~40% of the decode."""
    skip = read_skip(buf, offset)
    nb, df = skip.nblocks, skip.df
    deltas = np.empty(df, np.uint32)
    tfs = np.empty(df, np.uint32) if with_tfs else np.empty(0, np.uint32)
    data0 = offset + skip.data_start
    dstarts = data0 + skip.block_offsets[:-1]
    counts = np.full(nb, BLOCK, np.int64)
    counts[-1] = df - (nb - 1) * BLOCK
    doc_nbytes = (counts * skip.bits_doc + 7) // 8
    tstarts = dstarts + doc_nbytes

    full = np.arange(nb - 1) if counts[-1] != BLOCK else np.arange(nb)
    streams = [(deltas, skip.bits_doc, dstarts, 0)]
    if with_tfs:
        streams.append((tfs, skip.bits_tf, tstarts, 1))  # tf stored as tf-1
    for mat, widths, starts, bias in streams:
        for w in (np.unique(widths[full]) if len(full) else []):
            w = int(w)
            sel = full[widths[full] == w]
            if w == 0:
                vals = np.full(len(sel) * BLOCK, bias, np.uint32)
            else:
                vals = _gather_unpack(buf, starts[sel], 16 * w, w,
                                      BLOCK) + np.uint32(bias)
            idx = (sel[:, None] * BLOCK + np.arange(BLOCK)[None, :]).ravel()
            mat[idx] = vals
    if counts[-1] != BLOCK:  # partial tail block
        d, t = decode_block(buf, skip, nb - 1, offset)
        lo = (nb - 1) * BLOCK
        # recover tail deltas from decoded docs
        prev = np.uint32(skip.last_doc[nb - 2] + 1) if nb > 1 else np.uint32(0)
        dd = np.empty(len(d), np.uint32)
        dd[0] = d[0] - prev
        np.subtract(d[1:], d[:-1], out=dd[1:])
        dd[1:] -= 1
        deltas[lo:] = dd
        if with_tfs:
            tfs[lo:] = t

    docs = (np.cumsum(deltas.astype(np.uint64) + 1) - 1).astype(np.uint32)
    return docs, tfs


def decode_postings_multi(buf, offsets: list[int], bases: list[int],
                          with_tfs: bool = True
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY posting regions of one buffer in a single batched pass
    -> (global doc ids int64 = local docs + per-region base, tfs),
    concatenated in region order.

    The many-runs-per-term shape is the at-scale norm (one run per build
    partition: 10^7 partitions at 10^12 docs), and per-region decode
    overhead dominates cold multi-term queries (measured: a 3-head-term
    OR spent 54 ms in 120 per-region decode calls). Here full 128-blocks
    are gathered and bit-unpacked grouped by width ACROSS regions (one
    kernel call per distinct width per stream), partial tail blocks
    decode individually, and one global segmented cumsum restores
    per-region absolute doc ids."""
    n = len(offsets)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint32)
    skips = [read_skip(buf, off) for off in offsets]
    dfs = np.array([s.df for s in skips], np.int64)
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(dfs, out=out_off[1:])
    total = int(out_off[-1])
    deltas = np.empty(total, np.uint32)
    tfs_all = np.empty(total if with_tfs else 0, np.uint32)

    gd_starts, gd_w = [], []          # full doc-delta blocks
    gt_starts, gt_w = [], []          # full tf blocks
    g_outpos = []                     # output row of each full block
    tails: list[int] = []
    for ri, (s, off) in enumerate(zip(skips, offsets)):
        nb = s.nblocks
        data0 = off + s.data_start
        dstarts = data0 + s.block_offsets[:-1]
        last_cnt = s.df - (nb - 1) * BLOCK
        counts = np.full(nb, BLOCK, np.int64)
        counts[-1] = last_cnt
        doc_nbytes = (counts * s.bits_doc + 7) // 8
        tstarts = dstarts + doc_nbytes
        nfull = nb if last_cnt == BLOCK else nb - 1
        if nfull:
            gd_starts.append(dstarts[:nfull])
            gd_w.append(s.bits_doc[:nfull])
            gt_starts.append(tstarts[:nfull])
            gt_w.append(s.bits_tf[:nfull])
            g_outpos.append(out_off[ri]
                            + np.arange(nfull, dtype=np.int64) * BLOCK)
        if last_cnt != BLOCK:
            tails.append(ri)

    if g_outpos:
        op = np.concatenate(g_outpos)
        streams = [(deltas, np.concatenate(gd_w),
                    np.concatenate(gd_starts), 0)]
        if with_tfs:
            streams.append((tfs_all, np.concatenate(gt_w),
                            np.concatenate(gt_starts), 1))
        for mat, widths, starts, bias in streams:
            for w in np.unique(widths):
                w = int(w)
                sel = np.flatnonzero(widths == w)
                if w == 0:
                    vals = np.full(len(sel) * BLOCK, bias, np.uint32)
                else:
                    vals = _gather_unpack(buf, starts[sel], 16 * w, w,
                                          BLOCK) + np.uint32(bias)
                idx = (op[sel][:, None]
                       + np.arange(BLOCK, dtype=np.int64)[None, :]).ravel()
                mat[idx] = vals

    if tails:
        # partial tail blocks, batched by width: raw stored deltas drop
        # straight into the global delta chain (block-first deltas are
        # relative to the previous block's last_doc by construction), so
        # no per-tail decode_block + re-diff round trip
        t_cnt = np.empty(len(tails), np.int64)
        t_lo = np.empty(len(tails), np.int64)
        t_dstart = np.empty(len(tails), np.int64)
        t_tstart = np.empty(len(tails), np.int64)
        t_wd = np.empty(len(tails), np.uint8)
        t_wt = np.empty(len(tails), np.uint8)
        for k, ri in enumerate(tails):
            s = skips[ri]
            nb = s.nblocks
            cnt = s.df - (nb - 1) * BLOCK
            start = (offsets[ri] + s.data_start
                     + int(s.block_offsets[nb - 1]))
            t_cnt[k] = cnt
            t_lo[k] = int(out_off[ri]) + (nb - 1) * BLOCK
            t_dstart[k] = start
            t_tstart[k] = start + (cnt * int(s.bits_doc[nb - 1]) + 7) // 8
            t_wd[k] = s.bits_doc[nb - 1]
            t_wt[k] = s.bits_tf[nb - 1]
        t_streams = [(deltas, t_wd, t_dstart, 0)]
        if with_tfs:
            t_streams.append((tfs_all, t_wt, t_tstart, 1))
        out_idx_cache: dict = {}
        for mat, widths, starts, bias in t_streams:
            for w in np.unique(widths):
                sel = np.flatnonzero(widths == w)
                key = tuple(sel.tolist())
                idx = out_idx_cache.get(key)
                if idx is None:
                    idx = np.concatenate(
                        [t_lo[i] + np.arange(t_cnt[i]) for i in sel])
                    out_idx_cache[key] = idx
                vals = _unpack_rows(buf, starts[sel], t_cnt[sel], int(w))
                mat[idx] = vals + np.uint32(bias)

    docs = np.cumsum(deltas.astype(np.int64) + 1) - 1
    # segmented reset + per-region base: region ri's local docs are the
    # global running cumsum minus the carry accumulated before it
    adj = np.empty(n, np.int64)
    adj[0] = -int(bases[0])
    if n > 1:
        adj[1:] = (docs[out_off[1:-1] - 1] + 1
                   - np.asarray(bases[1:], np.int64))
    docs -= np.repeat(adj, dfs)
    return docs, tfs_all


def block_frontier_blob(tfs: np.ndarray, nids: np.ndarray) -> bytes:
    """Per-block (tf, fieldnorm-id) Pareto frontier -> sidecar blob.

    The block-max metadata true top-k pruning needs: a block's max BM25
    score under ANY (k1, b, avgdl) is attained at a pair where no other
    doc has both higher tf and lower fieldnorm — the Pareto frontier
    (typically 1-5 pairs per 128-doc block). ``max_tf`` alone bounds via
    the global min norm, which is orders of magnitude too loose to prune
    (measured: 100% of blocks kept on the bench corpus vs 1-3% with the
    frontier). Parameter-free, so merge byte-copies it and readers
    evaluate it lazily under their own BM25 params.

    Blob layout (little-endian)::

        u32 nblocks | u8 npairs[nblocks] | u32 tf[total] | u8 nid[total]

    This is the analog of tantivy's per-block ``BlockWandMaxInfo``
    (tf + fieldnorm id of the best-scoring doc), generalized to the
    whole frontier so the bound stays exact under stats drift (merges
    recompute avgdl; a single stored argmax pair would silently stop
    being the argmax)."""
    n = len(tfs)
    if n == 0:
        return np.array([0], np.uint32).tobytes()
    nb = (n + BLOCK - 1) // BLOCK
    block_of = np.arange(n, dtype=np.int64) >> 7
    t64 = np.asarray(tfs, np.int64)
    ns = np.asarray(nids, np.int64)
    order = np.lexsort((ns, -t64, block_of))
    bo = block_of[order]
    ts = t64[order]
    nss = ns[order]
    # segmented prefix-min of nid with free resets: each block's offset
    # places its values strictly BELOW every earlier block's, so the
    # global running min becomes block-local from the block's first row
    v = nss - bo * 256
    cm = np.minimum.accumulate(v)
    keep = np.empty(n, bool)
    keep[0] = True
    np.less(cm[1:], cm[:-1], out=keep[1:])
    ft = ts[keep].astype(np.uint32)
    fn = nss[keep].astype(np.uint8)
    npairs = np.bincount(bo[keep], minlength=nb).astype(np.uint8)
    return (np.array([nb], np.uint32).tobytes() + npairs.tobytes()
            + ft.tobytes() + fn.tobytes())


def parse_frontier_blob(buf) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (pair offsets int64[nblocks+1], tf f32[total], nid u8[total])."""
    mv = memoryview(buf)
    nb = int(np.frombuffer(mv, np.uint32, 1, 0)[0])
    npairs = np.frombuffer(mv, np.uint8, nb, 4).astype(np.int64)
    off = np.zeros(nb + 1, np.int64)
    np.cumsum(npairs, out=off[1:])
    total = int(off[-1])
    p = 4 + nb
    tf = np.frombuffer(mv, np.uint32, total, p).astype(np.float32)
    nid = np.frombuffer(mv, np.uint8, total, p + 4 * total)
    return off, tf, nid


def decode_blocks_gather(buf, dstarts: np.ndarray, counts: np.ndarray,
                         wd: np.ndarray, wt: np.ndarray,
                         prev: np.ndarray, with_tfs: bool = True
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Decode an ARBITRARY set of blocks — possibly spanning many runs of
    one buffer — in one width-grouped pass -> (doc ids int64 already
    rebased by ``prev``, tfs uint32), concatenated in entry order.

    Per entry: ``dstarts`` byte start of the block's doc deltas,
    ``counts`` values, ``wd``/``wt`` bit widths, ``prev`` the value the
    block's first doc is relative to PLUS any global base (for block i of
    a run at ``base``: ``base + (last_doc[i-1] + 1 if i else 0)``).
    This is the pruned top-k decode shape: the per-(term, run) call
    overhead of one-region-at-a-time decoding exceeds the decode itself
    once bounds prune runs down to a block or two each."""
    n = len(dstarts)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint32)
    counts = np.asarray(counts, np.int64)
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=out_off[1:])
    total = int(out_off[-1])
    deltas = np.empty(total, np.uint32)
    tfs = np.empty(total if with_tfs else 0, np.uint32)
    dstarts = np.asarray(dstarts, np.int64)
    tstarts = dstarts + (counts * np.asarray(wd, np.int64) + 7) // 8
    streams = [(deltas, np.asarray(wd), dstarts, 0)]
    if with_tfs:
        streams.append((tfs, np.asarray(wt), tstarts, 1))
    idx_cache: dict = {}
    for mat, widths, starts, bias in streams:
        for w in np.unique(widths):
            gsel = np.flatnonzero(widths == w)
            key = tuple(gsel.tolist())
            idx = idx_cache.get(key)
            if idx is None:
                idx = np.concatenate(
                    [out_off[i] + np.arange(counts[i]) for i in gsel])
                idx_cache[key] = idx
            vals = _unpack_rows(buf, starts[gsel], counts[gsel], int(w))
            mat[idx] = vals + np.uint32(bias)
    docs = np.cumsum(deltas.astype(np.int64) + 1) - 1
    prev = np.asarray(prev, np.int64)
    adj = np.empty(n, np.int64)
    adj[0] = -prev[0]
    if n > 1:
        adj[1:] = docs[out_off[1:-1] - 1] + 1 - prev[1:]
    docs -= np.repeat(adj, counts)
    return docs, tfs


def decode_postings_range(buf: bytes | memoryview, offset: int,
                          lo: int, hi: int
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the blocks whose docs intersect local range [lo, hi).

    The leaf-search path: a doc-range-pinned reader decodes ~1/N of each
    posting list via the ``last_doc`` skip array instead of the whole
    run (the reference's per-split leaf search reads only its split's
    postings, ``async_impl.rs:1007``)."""
    skip = read_skip(buf, offset)
    b0 = int(np.searchsorted(skip.last_doc, lo, side="left"))
    if b0 >= skip.nblocks:
        return np.empty(0, np.uint32), np.empty(0, np.uint32)
    # first block whose last_doc >= hi fully covers the range end
    b1 = min(int(np.searchsorted(skip.last_doc, hi, side="left")) + 1,
             skip.nblocks)
    doc_parts, tf_parts = [], []
    for bi in range(b0, b1):
        d, t = decode_block(buf, skip, bi, offset)
        doc_parts.append(d)
        tf_parts.append(t)
    docs = np.concatenate(doc_parts)
    tfs = np.concatenate(tf_parts)
    keep = (docs >= lo) & (docs < hi)
    return docs[keep], tfs[keep]


# ---------------------------------------------------------------------------
# positions stream (index_option="position" only): per term, all positions
# concatenated in doc order; per-doc counts == tfs, so offsets come free.
# ---------------------------------------------------------------------------

def encode_positions(positions: np.ndarray) -> bytes:
    pos = np.ascontiguousarray(positions, dtype=np.uint32)
    w = _width(pos)
    header = np.array([len(pos)], np.uint32).tobytes() + bytes([w])
    return header + _pack(pos, w)


def decode_positions(buf: bytes | memoryview, offset: int = 0) -> np.ndarray:
    mv = memoryview(buf)
    n = int(np.frombuffer(mv, np.uint32, 1, offset)[0])
    w = mv[offset + 4]
    raw = np.frombuffer(mv, np.uint8, (n * w + 7) // 8, offset + 5)
    return _unpack(raw, n, w)
