import numpy as np
import pytest

from tantivy4java_ray.postings import (
    BLOCK, decode_block, decode_positions, decode_postings, encode_positions,
    encode_postings, read_skip,
)


def roundtrip(docs, tfs):
    docs = np.asarray(docs, np.uint32)
    tfs = np.asarray(tfs, np.uint32)
    buf = encode_postings(docs, tfs)
    d, t = decode_postings(buf)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    return buf


def test_single_doc():
    roundtrip([7], [3])


def test_dense_run():
    n = 1000
    roundtrip(np.arange(n), np.ones(n))


def test_sparse_random():
    rng = np.random.default_rng(42)
    docs = np.unique(rng.integers(0, 10_000_000, 5000)).astype(np.uint32)
    tfs = rng.integers(1, 300, len(docs)).astype(np.uint32)
    buf = roundtrip(docs, tfs)
    # compression sanity: better than raw 8 bytes/posting
    assert len(buf) < len(docs) * 8


def test_exact_block_boundary():
    roundtrip(np.arange(0, BLOCK * 3) * 5, np.ones(BLOCK * 3))


def test_skip_metadata():
    docs = np.arange(0, 300, dtype=np.uint32) * 2
    tfs = np.arange(1, 301, dtype=np.uint32)
    buf = encode_postings(docs, tfs)
    sk = read_skip(buf)
    assert sk.df == 300 and sk.nblocks == 3
    assert list(sk.last_doc) == [docs[127], docs[255], docs[299]]
    assert list(sk.max_tf) == [128, 256, 300]
    # independent block decode
    d, t = decode_block(buf, sk, 1)
    assert np.array_equal(d, docs[128:256])
    assert np.array_equal(t, tfs[128:256])
    d, t = decode_block(buf, sk, 2)
    assert np.array_equal(d, docs[256:])


def test_large_doc_ids():
    docs = np.array([0, 2**31, 2**32 - 2, 2**32 - 1], np.uint32)
    roundtrip(docs, [1, 1, 2, 9])


def test_positions_roundtrip():
    pos = np.array([0, 5, 2, 1000, 0, 7], np.uint32)
    assert np.array_equal(decode_positions(encode_positions(pos)), pos)
    assert np.array_equal(decode_positions(encode_positions(np.zeros(3, np.uint32))),
                          np.zeros(3))


def test_offset_addressing():
    """Regions are addressed by offset inside one big shard buffer."""
    b1 = encode_postings(np.array([1, 5], np.uint32), np.array([1, 2], np.uint32))
    b2 = encode_postings(np.array([9], np.uint32), np.array([4], np.uint32))
    buf = b1 + b2
    d, t = decode_postings(buf, offset=len(b1))
    assert list(d) == [9] and list(t) == [4]


def test_empty_rejected():
    with pytest.raises(AssertionError):
        encode_postings(np.empty(0, np.uint32), np.empty(0, np.uint32))
