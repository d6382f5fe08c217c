"""JSON field indexing + subpath queries (``core/JsonObjectOptions.java``,
``native/src/query/json_query.rs`` analogs). The ``events`` testdata table
carries a JSON ``props`` string column."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.api import Index
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_json"

DOCS = [
    {"id": 0, "meta": '{"color": "red", "size": 10, "tags": ["a", "b"]}'},
    {"id": 1, "meta": '{"color": "blue", "size": 20, '
                      '"nested": {"deep": "x"}}'},
    {"id": 2, "meta": '{"color": "red", "size": 30}'},
    {"id": 3, "meta": None},
    {"id": 4, "meta": '{"other": true}'},
]


@pytest.fixture(scope="module")
def idx(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    pq.write_table(pa.table({
        "id": pa.array([d["id"] for d in DOCS], pa.int64()),
        "meta": pa.array([d["meta"] for d in DOCS], pa.string()),
    }), f"{BASE}/docs.parquet")
    s = IndexSchema()
    s.add_integer_field("id", fast=True)
    s.add_json_field("meta")
    return Index.create_from_parquet(f"{BASE}/docs.parquet", f"{BASE}/idx",
                                     s, num_shards=2)


def test_json_term(idx):
    r = idx.reader()
    docs, _ = r.evaluate(Query.json_term("meta", "color", "red"))
    assert list(docs) == [0, 2]
    docs, _ = r.evaluate(Query.json_term("meta", "nested.deep", "x"))
    assert list(docs) == [1]
    # json numbers / bools serialize via json.dumps
    docs, _ = r.evaluate(Query.json_term("meta", "size", "10"))
    assert list(docs) == [0]
    docs, _ = r.evaluate(Query.json_term("meta", "other", "true"))
    assert list(docs) == [4]


def test_json_array_values(idx):
    r = idx.reader()
    docs, _ = r.evaluate(Query.json_term("meta", "tags", "a"))
    assert list(docs) == [0]
    docs, _ = r.evaluate(Query.json_term("meta", "tags", "b"))
    assert list(docs) == [0]


def test_json_range(idx):
    r = idx.reader()
    # lexicographic over serialized values: sizes "10","20","30"
    docs, _ = r.evaluate(Query.json_range("meta", "size", "10", "20"))
    assert list(docs) == [0, 1]


def test_json_exists(idx):
    r = idx.reader()
    docs, _ = r.evaluate(Query.json_exists("meta", "color"))
    assert list(docs) == [0, 1, 2]
    docs, _ = r.evaluate(Query.json_exists("meta", "nested"))
    assert list(docs) == [1]
    # bool MUST_NOT gives IS NULL-style negation
    q = Query.boolean([(Occur.MUST, Query.all()),
                       (Occur.MUST_NOT, Query.json_exists("meta", "color"))])
    docs, _ = r.evaluate(q)
    assert list(docs) == [3, 4]


def test_events_props_json(ray_session, sf_dir):
    """The driver-generated events.props column round-trips."""
    import json
    s = IndexSchema()
    s.add_integer_field("event_id", fast=True)
    s.add_json_field("props")
    shutil.rmtree(f"{BASE}/idx_events", ignore_errors=True)
    ix = Index.create_from_parquet(f"{sf_dir}/events.parquet",
                                   f"{BASE}/idx_events", s, num_shards=4)
    r = ix.reader()
    rows = pq.read_table(f"{sf_dir}/events.parquet",
                         columns=["props"]).column("props").to_pylist()
    sample = json.loads(rows[0])
    key = sorted(sample)[0]
    val = sample[key]
    sval = val if isinstance(val, str) else json.dumps(val)
    expected = [i for i, p in enumerate(rows) if p and
                json.loads(p).get(key) == val]
    docs, _ = r.evaluate(Query.json_term("props", key, sval))
    got = set(docs)
    assert set(expected).issubset(got)


def test_struct_flatten_parity():
    """Vectorized struct-column flatten emits the SAME (row, term) pairs
    as the per-row JSON-string walk (term-string parity pinned)."""
    import json

    import numpy as np

    from tantivy4java_ray.pipelines.build import (_flatten_json_terms,
                                                  _flatten_struct_terms)
    objs = [
        {"color": "red", "size": 10.0, "count": 3, "tags": ["a", "b"],
         "nested": {"deep": "x", "score": 1.5}},
        {"color": "blue", "size": 20.0, "count": None, "tags": [],
         "nested": None},
        None,
        {"color": None, "size": 30.5, "count": 5, "tags": ["c"],
         "nested": {"deep": "y", "score": 2.0}},
        {"color": "red", "size": 0.0, "count": -7, "tags": ["a", "a"],
         "nested": {"deep": "", "score": -3.25}},
    ]
    # 'count' is int64 WITH nulls: to_numpy would promote to float64 and
    # emit 'count\x013.0' instead of 'count\x013' (regression: review)
    struct_col = pa.array(objs, pa.struct([
        ("color", pa.string()), ("size", pa.float64()),
        ("count", pa.int64()),
        ("tags", pa.list_(pa.string())),
        ("nested", pa.struct([("deep", pa.string()),
                              ("score", pa.float64())]))]))
    str_col = pa.array(
        [json.dumps({k: v for k, v in o.items() if v is not None})
         if o is not None else None for o in objs], pa.string())
    r1, t1 = _flatten_struct_terms(struct_col)
    r2, t2 = _flatten_json_terms(str_col)
    pairs1 = sorted(zip(r1.tolist(), t1.tolist()))
    pairs2 = sorted(zip(r2.tolist(), t2.tolist()))
    assert pairs1 == pairs2

    # list<struct> children (array-of-objects JSON)
    objs2 = [
        {"items": [{"sku": "a1", "qty": 2}, {"sku": "b2", "qty": 5}]},
        {"items": []},
        {"items": [{"sku": "c3", "qty": None}]},
        None,
    ]
    sc2 = pa.array(objs2, pa.struct([
        ("items", pa.list_(pa.struct([("sku", pa.string()),
                                      ("qty", pa.int64())])))]))
    s2 = pa.array([json.dumps(o) if o is not None else None
                   for o in objs2], pa.string())
    ra, ta = _flatten_struct_terms(sc2)
    rb, tb = _flatten_json_terms(s2)
    assert sorted(zip(ra.tolist(), ta.tolist())) == \
        sorted(zip(rb.tolist(), tb.tolist()))


def test_struct_json_index_end_to_end(ray_session, tmp_path):
    """An index built from a parquet STRUCT column answers the same
    json_term / json_range queries as one built from JSON strings."""
    import json

    d = str(tmp_path / "structdocs")
    os.makedirs(d)
    objs = [{"k": i % 7, "name": f"n{i % 3}"} for i in range(40)]
    pq.write_table(pa.table({
        "id": pa.array(range(40), pa.int64()),
        "props": pa.array(objs, pa.struct([("k", pa.int64()),
                                           ("name", pa.string())])),
    }), f"{d}/docs.parquet")
    s = IndexSchema()
    s.add_integer_field("id", fast=True)
    s.add_json_field("props")
    ix = Index.create_from_parquet(f"{d}/docs.parquet",
                                   str(tmp_path / "idx"), s, num_shards=2)
    r = ix.reader()
    docs, _ = r.evaluate(Query.json_term("props", "name", "n1"))
    assert docs.tolist() == [i for i in range(40) if i % 3 == 1]
    docs, _ = r.evaluate(Query.json_range("props", "k", 2, 5,
                                          True, False))
    assert docs.tolist() == [i for i in range(40) if 2 <= i % 7 < 5]


def test_json_exists_check_subpaths(ray_session, tmp_path):
    # Query.jsonExistsQuery(..., checkSubpaths) parity
    # (query/Query.java:417-420): with False, only a VALUE at the exact
    # path matches; a doc carrying only path.sub does not
    import pyarrow as pa
    from tantivy4java_ray.api import Index
    from tantivy4java_ray.query import Query
    # JSON-string column: one doc must hold a STRING at 'user' while
    # another holds an object under it — impossible in one Arrow struct
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a", "b", "c", "d"]),
        "props": pa.array(['{"user": {"email": "x@y"}}',
                           '{"user": null}',
                           '{"other": 1.5}',
                           '{"user": "direct"}']),
    })
    s = IndexSchema()
    s.add_integer_field("doc_id", fast=True)
    s.add_text_field("text")
    s.add_json_field("props")
    idx = str(tmp_path / "idx")
    Index.create_from_documents(docs, idx, schema=s, num_shards=2,
                                target_docs_per_partition=4)
    r = Index(idx).reader()
    both = sorted(r.evaluate(Query.json_exists("props", "user"))[0])
    exact = sorted(r.evaluate(
        Query.json_exists("props", "user", check_subpaths=False))[0])
    assert both == [0, 3]     # subpath (doc 0) or direct value (doc 3)
    assert exact == [3]       # only the direct value
    # wire-form round trip keeps the flag
    q = Query.json_exists("props", "user", check_subpaths=False)
    from tantivy4java_ray.query import Query as Q
    assert Q.from_json(q.to_json()).params[2] is False
    # pre-r4 2-tuple wire form still evaluates (subpaths default True)
    legacy = Q("json_exists", ("props", "user"))
    assert sorted(r.evaluate(legacy)[0]) == [0, 3]
