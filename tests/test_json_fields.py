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
