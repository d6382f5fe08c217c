"""Snippets, scalars (IP/facet/date), partition pruning, facet counts,
streaming retrieval, split utilities, API facade."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.functions.scalars import (
    expand_ip_query_bounds, facet_ancestors, facet_encode, facet_parts,
    format_date_us, normalize_ip, parse_date_us, string_fingerprint,
    truncate_utf8,
)
from tantivy4java_ray.functions.snippet import SnippetGenerator
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_extras"


def test_normalize_ip():
    assert normalize_ip("192.168.0.1") == "::ffff:192.168.0.1"
    assert normalize_ip("::FFFF:10.0.0.1") == "::ffff:10.0.0.1"
    assert normalize_ip("2001:0DB8:0:0:0:0:0:1") == "2001:db8::1"
    # query bounds use the fixed-width u128 hex term form
    lo, hi = expand_ip_query_bounds("10.0.0.1", None)
    assert lo == "00000000000000000000ffff0a000001" and hi is None
    from tantivy4java_ray.functions.scalars import ip_term
    # numeric order == lexicographic order on the term form
    assert ip_term("9.0.0.1") < ip_term("10.255.255.255")
    assert ip_term("::FFFF:10.0.0.1") == ip_term("10.0.0.1")
    assert ip_term("2001:db8::1") > ip_term("255.255.255.255")


def test_facet_paths():
    assert facet_encode("tools", "saw") == "/tools/saw"
    assert facet_parts("/tools/saw") == ["tools", "saw"]
    assert facet_ancestors("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
    assert facet_parts(facet_encode("a/b", "c")) == ["a/b", "c"]


def test_dates_microseconds():
    us = parse_date_us("2024-03-01T12:00:00.000123")
    assert us % 1_000_000 == 123
    assert format_date_us(us) == "2024-03-01T12:00:00.000123"


def test_truncate_utf8():
    assert truncate_utf8("é" * 200, 256) == "é" * 128
    assert truncate_utf8("short", 256) == "short"


def test_string_fingerprint_null_zero():
    fp = string_fingerprint(np.array(["a", None, "b", "a"], object))
    assert fp[1] == 0 and fp[0] == fp[3] != 0 and fp[2] not in (0, fp[0])


def test_snippet_generator():
    q = Query.boolean([(Occur.SHOULD, Query.term("text", "fox")),
                       (Occur.SHOULD, Query.term("text", "dog"))])
    gen = SnippetGenerator(q, max_chars=60)
    text = "The quick brown Fox jumps over the lazy dog near the river."
    snip = gen.snippet_from_text(text)
    assert "<b>Fox</b>" in snip and "<b>dog</b>" in snip
    assert gen.snippet_from_text("nothing relevant here") == ""
    assert gen.snippet_from_text(None) == ""


@pytest.fixture(scope="module")
def facet_index(ray_session):
    from tantivy4java_ray.api import Index
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    tbl = pa.table({
        "title": pa.array(["saw", "drill", "hammer", "apple", "pear"]),
        "category": pa.array(["/tools/hand/saw", "/tools/power/drill",
                              "/tools/hand/hammer", "/food/fruit/apple",
                              "/food/fruit/pear"]),
        "ip": pa.array(["10.0.0.1", "10.0.0.2", "192.168.1.9",
                        "2001:db8::1", "10.0.0.1"]),
        "price": pa.array([10.0, 120.0, 15.0, 1.0, 2.0]),
    })
    pq.write_table(tbl, f"{BASE}/items.parquet", row_group_size=2)
    s = IndexSchema()
    s.add_text_field("title", index_option="position")
    s.add_facet_field("category")
    s.add_ip_addr_field("ip", fast=True)
    s.add_float_field("price", fast=True)
    return Index.create_from_parquet(f"{BASE}/items.parquet", f"{BASE}/idx",
                                     s, target_docs_per_partition=2,
                                     num_shards=2)


def test_facet_term_and_counts(facet_index):
    r = facet_index.reader()
    docs, _ = r.evaluate(Query.term("category", "/tools"))
    assert list(docs) == [0, 1, 2]
    docs, _ = r.evaluate(Query.term("category", "/tools/hand"))
    assert list(docs) == [0, 2]
    counts = r.facet_counts("category", "/")
    assert counts == [("/tools", 3), ("/food", 2)]
    counts = r.facet_counts("category", "/tools")
    assert counts == [("/tools/hand", 2), ("/tools/power", 1)]
    # with a query filter
    counts = r.facet_counts("category", "/tools",
                            query=Query.term("title", "saw"))
    assert counts == [("/tools/hand", 1), ("/tools/power", 0)]


def test_ip_term_and_range(facet_index):
    r = facet_index.reader()
    docs, _ = r.evaluate(Query.term("ip", "10.0.0.1"))
    assert list(docs) == [0, 4]
    # u128-numeric range (bounds in any accepted textual form)
    docs, _ = r.evaluate(Query.range("ip", "::ffff:10.0.0.0",
                                     "::ffff:10.255.255.255"))
    assert list(docs) == [0, 1, 4]
    docs, _ = r.evaluate(Query.range("ip", "10.0.0.0", "192.168.1.9"))
    assert list(docs) == [0, 1, 2, 4]
    # v6 addresses sort above every v4-mapped address, never leak into
    # a v4-bounded range; an all-v6 range finds only the v6 doc
    docs, _ = r.evaluate(Query.range("ip", "2001:db8::", "2001:db8::ffff"))
    assert list(docs) == [3]


def test_ip_range_numeric_not_text_order(ray_session):
    # the round-2 defect: text order on ::ffff:9.0.0.1 sorts AFTER
    # ::ffff:10.255.255.255, so [2.0.0.0, 10.0.0.0] wrongly excluded
    # every 9.x address. u128 terms compare numerically.
    from tantivy4java_ray.api import Index
    base = "/tmp/t4jr_ip_u128"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    ips = ["2.0.0.5", "9.0.0.1", "9.255.255.255", "10.0.0.0",
           "10.255.255.255", "1.2.3.4", "100.1.1.1"]
    pq.write_table(pa.table({"ip": pa.array(ips)}),
                   f"{base}/t.parquet")
    s = IndexSchema()
    s.add_ip_addr_field("ip", fast=True)
    idx = Index.create_from_parquet(f"{base}/t.parquet", f"{base}/idx", s,
                                    num_shards=1)
    r = idx.reader()
    docs, _ = r.evaluate(Query.range("ip", "2.0.0.0", "10.0.0.0"))
    assert list(docs) == [0, 1, 2, 3]  # 9.x included, 10.0.0.0 inclusive
    docs, _ = r.evaluate(Query.range("ip", "2.0.0.0", "10.0.0.0",
                                     include_upper=False))
    assert list(docs) == [0, 1, 2]
    # stored/fast column keeps the pretty canonical display form
    vals, valid = r.fast_column("ip")
    assert valid.all() and vals[1] == "::ffff:9.0.0.1"


def test_partition_pruning_stats(facet_index):
    r = facet_index.reader()
    # partitions of 2 rows: prices [10,120], [15,1], [2]
    st = r.partition_stats("price", r.partitions[0])
    assert st == (10.0, 120.0)
    docs, _ = r.evaluate(Query.range("price", 100.0, None))
    assert list(docs) == [1]
    # a range matching nothing prunes all partitions
    docs, _ = r.evaluate(Query.range("price", 1000.0, None))
    assert len(docs) == 0


def test_split_utilities(facet_index):
    from tantivy4java_ray.pipelines.search import (
        list_index_files, read_index_metadata, validate_index)
    meta = read_index_metadata(facet_index.index_dir)
    assert meta["num_docs"] == 5 and meta["committed"]
    files = list_index_files(facet_index.index_dir)
    assert any(f.endswith("terms.parquet") for f in files)
    assert any(f.startswith("txlog/") for f in files)
    assert validate_index(facet_index.index_dir) == []


def test_matching_docs_dataset(facet_index, ray_session):
    from tantivy4java_ray.pipelines.search import matching_docs_dataset
    ds = matching_docs_dataset(facet_index.index_dir,
                               Query.term("category", "/tools"),
                               columns=["title"])
    out = ds.to_pandas().sort_values("doc_id")
    assert out["title"].tolist() == ["saw", "drill", "hammer"]


def test_highlighted_docs_dataset(facet_index, ray_session):
    from tantivy4java_ray.pipelines.search import highlighted_docs_dataset
    ds = highlighted_docs_dataset(facet_index.index_dir,
                                  Query.term("title", "saw"),
                                  field="title")
    out = ds.to_pandas()
    assert out["doc_id"].tolist() == [0]
    assert out["snippet"].tolist() == ["<b>saw</b>"]


def test_api_facade(facet_index):
    s = facet_index.searcher()
    res = s.search("title:saw", limit=5)
    assert len(res) == 1 and res.hits[0][1] == 0
    d = s.doc(0, fields=["title"])
    assert d["title"] == "saw"
    assert s.doc_freq("title", "saw") == 1
    assert s.num_docs() == 5
    agg = s.aggregate(None, {"p": {"stats": {"field": "price"}}})
    assert agg["p"]["count"] == 5
    ex = s.explain(Query.term("title", "saw"), 0)
    assert ex["matched"]


def test_highlight_hits(facet_index):
    from tantivy4java_ray.functions.snippet import highlight_hits
    r = facet_index.reader()
    q = Query.term("title", "saw")
    snips = highlight_hits(r, q, [0], field="title")
    assert snips == ["<b>saw</b>"]


def test_create_from_documents(ray_session):
    from tantivy4java_ray.api import Index
    idx_dir = f"{BASE}/idx_docs"
    shutil.rmtree(idx_dir, ignore_errors=True)
    s = IndexSchema()
    s.add_text_field("body", stored=True)
    s.add_integer_field("ref", fast=True)
    ix = Index.create_from_documents(
        [{"body": "the old man and the sea", "ref": 100},
         {"body": "of mice and men", "ref": 200}],
        idx_dir, s, num_shards=1)
    srch = ix.searcher()
    assert srch.search("body:mice", 5).hits[0][1] == 1
    assert srch.doc(0, fields=["ref"])["ref"] == 100


def test_driver_contract_shape():
    """Every queries() entry is callable; every oracle key has a query;
    the intentionally-unoracled set is exactly the documented one."""
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    import __ray_entry__ as m
    q = m.queries()
    o = m.oracle_sql()
    assert all(callable(f) for f in q.values())
    assert set(o) <= set(q), set(o) - set(q)
    no_oracle = set(q) - set(o)
    # only inherently-unoracleable entries may lack an oracle:
    # dedup_minhash is approximate by construction; bpe_stats is
    # iterative merge learning (no SQL equivalent) — both sit in the
    # tail, outside the driver's 50-row window, which holds 50 ORACLED
    # rows (pinned below)
    assert no_oracle == {"dedup_minhash", "bpe_stats"}, no_oracle
    assert all(k in o for k in list(q)[:50])
    assert callable(m.entry)


def test_more_like_this_full_parameter_surface(ray_session, tmp_path):
    # Query.moreLikeThisQuery's 8-parameter form (Query.java:238-246):
    # max_doc_freq / word-length bounds / stop_words filter the expanded
    # terms; boost_factor scales scores linearly
    import pyarrow as pa
    from tantivy4java_ray.api import Index
    from tantivy4java_ray.query import Query
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            "zebra quokka common common",
            "zebra common",
            "quokka common",
            "common common filler",
            "ab common",          # 'ab' is a 2-byte token
            "ab zebra",
        ]),
    })
    idx = str(tmp_path / "mlt")
    Index.create_from_documents(docs, idx, num_shards=2,
                                target_docs_per_partition=6)
    r = Index(idx).reader()
    ref = {"text": "zebra quokka common ab"}

    def terms(q):
        expanded = r._expand_mlt(*q.params)
        out = set()
        def walk(x):
            if x.kind == "term":
                out.add(x.params[1])
            elif x.kind == "bool":
                for _o, s in x.params:
                    walk(s)
            elif x.kind in ("boost", "const"):
                walk(x.params[0])
        walk(expanded)
        return out

    base = Query.more_like_this(ref)
    assert terms(base) == {"zebra", "quokka", "common", "ab"}
    # max_doc_freq drops 'common' (df 5)
    assert "common" not in terms(Query.more_like_this(ref, max_doc_freq=4))
    # byte-length bounds: min 3 drops 'ab'; max 5 drops 'quokka' (6 B)
    assert "ab" not in terms(Query.more_like_this(ref, min_word_length=3))
    assert "quokka" not in terms(
        Query.more_like_this(ref, max_word_length=5))
    # stop words
    assert "zebra" not in terms(
        Query.more_like_this(ref, stop_words=("zebra",)))
    # boost_factor scales every score by exactly the factor
    plain = r.search(base, 6).hits
    boosted = r.search(Query.more_like_this(ref, boost_factor=2.5), 6).hits
    assert [d for _s, d in plain] == [d for _s, d in boosted]
    for (s1, _), (s2, _) in zip(plain, boosted):
        assert s2 == pytest.approx(2.5 * s1, rel=1e-6)
