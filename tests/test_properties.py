"""Property-based tests (hypothesis): codec roundtrips, quantization
invariants, analyzer laws, top-k selection vs brute force."""

import numpy as np
from hypothesis import given, settings, strategies as st

from tantivy4java_ray.analyzer import get_analyzer
from tantivy4java_ray.fieldnorm import fieldnorm_to_id, id_to_fieldnorm
from tantivy4java_ray.postings import (
    decode_block, decode_positions, decode_postings, encode_positions,
    encode_postings, read_skip,
)


@st.composite
def posting_lists(draw):
    n = draw(st.integers(1, 600))
    gaps = draw(st.lists(st.integers(1, 1 << 20), min_size=n, max_size=n))
    docs = np.cumsum(np.asarray(gaps, np.uint64)).astype(np.uint32) - 1
    tfs = np.asarray(draw(st.lists(st.integers(1, 1 << 16), min_size=n,
                                   max_size=n)), np.uint32)
    return docs, tfs


@given(posting_lists())
@settings(max_examples=60, deadline=None)
def test_postings_roundtrip_property(pl):
    docs, tfs = pl
    buf = encode_postings(docs, tfs)
    d, t = decode_postings(buf)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    # every block decodes independently and skip metadata is consistent
    sk = read_skip(buf)
    assert sk.df == len(docs)
    for i in range(sk.nblocks):
        bd, bt = decode_block(buf, sk, i)
        lo = i * 128
        assert np.array_equal(bd, docs[lo:lo + len(bd)])
        assert np.array_equal(bt, tfs[lo:lo + len(bt)])
        assert sk.last_doc[i] == bd[-1]
        assert sk.max_tf[i] == bt.max()


@given(st.lists(st.integers(0, 1 << 28), min_size=0, max_size=2000))
@settings(max_examples=40, deadline=None)
def test_positions_roundtrip_property(vals):
    pos = np.asarray(vals, np.uint32)
    assert np.array_equal(decode_positions(encode_positions(pos)), pos)


@given(st.lists(st.integers(0, 1 << 40), min_size=1, max_size=500))
@settings(max_examples=40, deadline=None)
def test_fieldnorm_quantization_properties(vals):
    lens = np.asarray(vals, np.uint64)
    ids = fieldnorm_to_id(lens)
    dec = id_to_fieldnorm(ids)
    # floor contract + monotonicity of the quantizer
    assert np.all(dec <= lens)
    order = np.argsort(lens)
    assert np.all(np.diff(ids[order].astype(np.int64)) >= 0)


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_analyzer_laws(text):
    a = get_analyzer("default")
    toks = a.tokenize(text)
    # all tokens lowercase, non-empty, within the byte limit, no separators
    for t in toks:
        assert t == t.lower()
        assert 0 < len(t.encode()) <= 255
    # idempotent: retokenizing the tokens yields the same tokens
    assert a.tokenize(" ".join(toks)) == toks


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_raw_analyzer_identity(text):
    a = get_analyzer("raw")
    assert a.tokenize(text) == ([text] if text else [])


@given(st.lists(st.tuples(st.integers(0, 10_000),
                          st.floats(0.001, 100.0, allow_nan=False)),
                min_size=1, max_size=500, unique_by=lambda x: x[0]),
       st.integers(1, 20))
@settings(max_examples=50, deadline=None)
def test_top_k_matches_sorted_brute_force(items, k):
    from tantivy4java_ray.pipelines.search import _top_k
    items.sort()
    docs = np.array([d for d, _ in items], np.int64)
    scores = np.array([s for _, s in items], np.float32)
    got = _top_k(docs, scores, k)
    want = sorted(zip(scores.tolist(), docs.tolist()),
                  key=lambda x: (-x[0], x[1]))[:k]
    assert got == [(float(s), int(d)) for s, d in want]


@given(st.text(max_size=120), st.text(max_size=120), st.integers(0, 3))
@settings(max_examples=80, deadline=None)
def test_edit_distance_symmetry_and_bounds(a, b, cap):
    from tantivy4java_ray.pipelines.search import _edit_distance
    d1 = _edit_distance(a, b, cap, True)
    d2 = _edit_distance(b, a, cap, True)
    assert min(d1, cap + 1) == min(d2, cap + 1)
    assert _edit_distance(a, a, cap, True) == 0


# ---------------------------------------------------------------------------
# round-2 properties
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=600,
                unique=True),
       st.integers(0, 2**31))
@settings(max_examples=40, deadline=None)
def test_decode_postings_range_equals_slice(doc_ids, lo):
    from tantivy4java_ray import postings as pc
    docs = np.sort(np.array(doc_ids, np.uint32))
    tfs = (docs % 7 + 1).astype(np.uint32)
    blob = pc.encode_postings(docs, tfs)
    hi = lo + 2**20
    d, t = pc.decode_postings_range(blob, 0, lo, hi)
    keep = (docs >= lo) & (docs < hi)
    np.testing.assert_array_equal(d, docs[keep])
    np.testing.assert_array_equal(t, tfs[keep])


@given(st.lists(st.floats(allow_nan=False, width=64), min_size=2,
                max_size=50))
@settings(max_examples=60, deadline=None)
def test_f64_sortable_encoding_order(vals):
    from tantivy4java_ray.pipelines.search import encode_f64_sortable
    pairs = sorted((v, encode_f64_sortable(v)) for v in vals)
    encs = [e for _v, e in pairs]
    assert encs == sorted(encs)


@given(st.lists(st.tuples(st.text(max_size=20),
                          st.integers(-2**62, 2**62),
                          st.one_of(st.none(), st.text(max_size=8)),
                          st.lists(st.integers(-100, 100), max_size=5)),
                max_size=20),
       st.sampled_from(["null", "deflate"]))
@settings(max_examples=30, deadline=None)
def test_avro_roundtrip_fuzz(rows, codec):
    from tantivy4java_ray.sources.avro import read_avro_file, write_avro_file
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "o", "type": ["null", "string"]},
        {"name": "a", "type": {"type": "array", "items": "long"}}]}
    recs = [{"s": s, "n": n, "o": o, "a": a} for s, n, o, a in rows]
    _schema, got = read_avro_file(write_avro_file(schema, recs, codec=codec))
    assert got == recs


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_phrase_slop0_vectorized_equals_exact(data):
    """The composite-key slop-0 phrase counter must equal the per-doc
    exact counter on random position lists (regression guard for the
    vectorized path in _eval_phrase)."""
    from tantivy4java_ray.pipelines.search import _count_phrase_matches
    n_terms = data.draw(st.integers(2, 4))
    offsets = sorted(data.draw(st.lists(
        st.integers(0, 6), min_size=n_terms, max_size=n_terms,
        unique=True)))
    n_docs = data.draw(st.integers(1, 8))
    # per doc, per term: sorted unique positions
    per_doc = []
    for _ in range(n_docs):
        plists = [np.array(sorted(data.draw(st.sets(
            st.integers(0, 25), min_size=1, max_size=8))), np.int64)
            for _ in range(n_terms)]
        per_doc.append(plists)
    # exact per-doc counts
    want = {d: _count_phrase_matches(per_doc[d], offsets, 0)
            for d in range(n_docs)}
    want = {d: c for d, c in want.items() if c > 0}
    # drive the PRODUCTION helper with the same packed (off, idx, pos)
    # layout _eval_phrase builds (cumsum-packed positions per term)
    from tantivy4java_ray.pipelines.search import _phrase_slop0_counts
    pos_lookup = []
    for ti in range(n_terms):
        plists = [per_doc[d][ti] for d in range(n_docs)]
        lens = np.array([len(p) for p in plists], np.int64)
        off = np.concatenate(([0], np.cumsum(lens)))
        idx = np.arange(n_docs, dtype=np.int64)
        pos = (np.concatenate(plists) if plists
               else np.empty(0, np.int64))
        pos_lookup.append((off, idx, pos))
    ci, cnt = _phrase_slop0_counts(n_docs, pos_lookup, offsets)
    got = dict(zip(ci.tolist(), cnt.tolist()))
    assert got == want
    # mapping back through huge global doc ids must not overflow
    cand = (np.arange(n_docs, dtype=np.int64) + (np.int64(1) << 40))
    assert (cand[ci] >= (1 << 40)).all()
