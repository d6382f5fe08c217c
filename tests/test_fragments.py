"""Map-side pre-encoded posting fragments (round 3).

Hot terms (df within one build partition >= ``frag_min_df``) are
bitpacked to final block-128 format on the MAP side and appended by the
reduce as independent runs — the scaling fix for the reduce phase. A
fragment build must be indistinguishable from a cold build at every
query surface (runs are merge-sorted / WAND-cursored exactly like the
salted-hot-term runs that predate them)."""

import collections
import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.schema import IndexSchema
from tantivy4java_ray.sources.webpages import write_webpages


def _schema():
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("lang", fast=True)
    return s


@pytest.fixture(scope="module")
def frag_pair(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("frag")
    write_webpages(str(base / "data"), 1200, n_files=2,
                   rows_per_row_group=300)
    a = build_index(str(base / "data"), str(base / "idx_frag"), _schema(),
                    target_docs_per_partition=300, num_shards=3,
                    frag_min_df=4, keep_partials=True)
    build_index(str(base / "data"), str(base / "idx_cold"), _schema(),
                target_docs_per_partition=300, num_shards=3,
                frag_min_df=0)
    assert a.num_docs == 1200
    return base


def test_fragments_written_and_dictionary_sorted(frag_pair):
    enc = glob.glob(str(frag_pair / "idx_frag/_partials/*/*.enc.parquet"))
    assert enc, "low threshold must produce pre-encoded fragments"
    t = pq.read_table(str(frag_pair / "idx_frag/shards/shard-00000/terms.parquet"))
    keys = t.column("key").to_pylist()
    assert keys == sorted(keys)  # readers binary-search the dictionary
    runs = collections.Counter(keys)
    assert any(c > 1 for c in runs.values())  # multi-run terms exist


def test_fragment_build_matches_cold_build(frag_pair):
    ra = IndexReader(str(frag_pair / "idx_frag"))
    rb = IndexReader(str(frag_pair / "idx_cold"))
    for q in ["needleterm", 'text:"alpha bravo charlie"',
              "w0001 AND w0002", "w0003 OR w0007", "w00*", "lang:en"]:
        ha, hb = ra.search(q, 40).hits, rb.search(q, 40).hits
        assert [(d, round(s, 4)) for s, d in ha] == \
               [(d, round(s, 4)) for s, d in hb], q
    # raw postings + positions parity on a genuinely multi-run term
    t = pq.read_table(str(frag_pair / "idx_frag/shards/shard-00000/terms.parquet"))
    pairs = collections.Counter(zip(t.column("field").to_pylist(),
                                    t.column("term").to_pylist()))
    field, term = max(pairs, key=pairs.get)
    assert pairs[(field, term)] > 1
    da, ta = ra.postings(field, term)
    db, tb = rb.postings(field, term)
    assert np.array_equal(da, db) and np.array_equal(ta, tb)
    _, _, xa = ra.positions(field, term)
    _, _, xb = rb.positions(field, term)
    assert np.array_equal(xa, xb)
    # WAND equals scan on the fragment build (cursor-per-run path)
    hw = ra.search(term, 15, method="wand").hits
    hs = rb.search(term, 15).hits
    assert [(d, s) for s, d in hw] == [(d, s) for s, d in hs]


def test_merge_of_fragment_indexes(ray_session, tmp_path):
    """Index merge (the LSM step) over multi-run fragment indexes must
    equal a single build over the union."""
    import glob as _glob

    from tantivy4java_ray.pipelines.merge import merge_indexes

    write_webpages(str(tmp_path / "d"), 1000, n_files=2,
                   rows_per_row_group=250)
    fs = sorted(_glob.glob(str(tmp_path / "d" / "*.parquet")))
    for i, f in enumerate(fs):
        build_index(f, str(tmp_path / f"i{i}"), _schema(),
                    target_docs_per_partition=250, num_shards=2,
                    frag_min_df=4)
    merge_indexes([str(tmp_path / "i0"), str(tmp_path / "i1")],
                  str(tmp_path / "im"))
    build_index(str(tmp_path / "d"), str(tmp_path / "iall"), _schema(),
                target_docs_per_partition=250, num_shards=2,
                frag_min_df=4)
    rm = IndexReader(str(tmp_path / "im"))
    ru = IndexReader(str(tmp_path / "iall"))
    for q in ["needleterm", '"alpha bravo charlie"', "w0004"]:
        hm = sorted(d for _, d in rm.search(q, 60).hits)
        hu = sorted(d for _, d in ru.search(q, 60).hits)
        assert hm == hu, q
