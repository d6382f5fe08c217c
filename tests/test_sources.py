"""Delta source, partition filter DSL, column renames, phash fields,
prewarm, term_set/dismax/offset query surfaces."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_sources"


@pytest.fixture(scope="module")
def delta_table():
    shutil.rmtree(BASE, ignore_errors=True)
    d = f"{BASE}/delta"
    os.makedirs(f"{d}/_delta_log")
    for i, rows in enumerate([(0, 3), (3, 3), (6, 3)]):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(rows[0], rows[0] + rows[1]), pa.int64()),
            "text": pa.array([f"doc number {j} alpha" for j in
                              range(rows[0], rows[0] + rows[1])])}),
            f"{d}/part-{i}.parquet")
    schema_str = json.dumps({"type": "struct", "fields": [
        {"name": "doc_id", "type": "long", "nullable": False,
         "metadata": {}},
        {"name": "text", "type": "string", "nullable": True,
         "metadata": {}}]})
    with open(f"{d}/_delta_log/00000000000000000000.json", "w") as f:
        f.write(json.dumps({"metaData": {"id": "t", "schemaString":
                                         schema_str}}) + "\n")
        f.write(json.dumps({"add": {"path": "part-0.parquet",
                                    "size": 1}}) + "\n")
        f.write(json.dumps({"add": {"path": "part-1.parquet",
                                    "size": 1}}) + "\n")
    with open(f"{d}/_delta_log/00000000000000000001.json", "w") as f:
        # version 1: remove part-1, add part-2
        f.write(json.dumps({"remove": {"path": "part-1.parquet"}}) + "\n")
        f.write(json.dumps({"add": {"path": "part-2.parquet",
                                    "size": 1}}) + "\n")
    return d


def test_delta_snapshot_versions(delta_table):
    from tantivy4java_ray.sources.delta import (
        delta_live_files, delta_versions, read_delta_snapshot)
    assert delta_versions(delta_table) == [0, 1]
    v0 = read_delta_snapshot(delta_table, version=0)
    assert [os.path.basename(f) for f in v0.files] == ["part-0.parquet",
                                                       "part-1.parquet"]
    latest = read_delta_snapshot(delta_table)
    assert [os.path.basename(f) for f in latest.files] == [
        "part-0.parquet", "part-2.parquet"]
    assert latest.schema["fields"][0]["name"] == "doc_id"
    assert delta_live_files(delta_table) == latest.files


def test_build_from_delta(delta_table, ray_session):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.sources.delta import delta_live_files
    s = IndexSchema()
    s.add_text_field("text")
    s.add_integer_field("doc_id", fast=True)
    build_index(delta_live_files(delta_table), f"{BASE}/idx_delta", s,
                num_shards=2)
    r = IndexReader(f"{BASE}/idx_delta")
    assert r.num_docs == 6  # part-1 removed
    docs, _ = r.evaluate(Query.term("text", "alpha"))
    assert len(docs) == 6


def test_iceberg_missing_table_raises():
    # live listing is real now (sources/avro.py); a missing table still
    # fails loudly rather than returning an empty list
    from tantivy4java_ray.sources.iceberg import iceberg_live_files
    with pytest.raises(FileNotFoundError, match="iceberg"):
        iceberg_live_files("/nonexistent")


def test_partition_filter(sf_dir):
    from tantivy4java_ray.sources.partition_filter import PartitionFilter
    f = (PartitionFilter.eq("event_type", "click")
         & PartitionFilter.gte("value", 10.0))
    t = f.scan(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    import duckdb
    n = duckdb.sql(f"SELECT count(*) FROM '{sf_dir}/events.parquet' WHERE "
                   "event_type='click' AND value >= 10.0").fetchone()[0]
    assert t.num_rows == n
    f2 = PartitionFilter.is_in("event_type", ["click", "view"]) \
        | PartitionFilter.is_null("value")
    assert f2.to_expression() is not None
    assert "event_type" in f2.to_json()


@pytest.fixture(scope="module")
def renamed_index(ray_session):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    os.makedirs(f"{BASE}/renames", exist_ok=True)
    pq.write_table(pa.table({
        "c_body": pa.array(["hello world", "goodbye world"]),
        "c_tag": pa.array(["x", "y"])}),
        f"{BASE}/renames/data.parquet")
    s = IndexSchema()
    s.add_text_field("body")
    s.add_string_field("tag", fast=True)
    build_index(f"{BASE}/renames/data.parquet", f"{BASE}/idx_renamed", s,
                num_shards=1,
                column_renames={"c_body": "body", "c_tag": "tag"},
                phash_fields=("tag",))
    return IndexReader(f"{BASE}/idx_renamed")


def test_column_renames(renamed_index):
    docs, _ = renamed_index.evaluate(Query.term("body", "hello"))
    assert list(docs) == [0]
    docs, _ = renamed_index.evaluate(Query.term("tag", "y"))
    assert list(docs) == [1]


def test_phash_hidden_column(renamed_index):
    vals, valid = renamed_index.fast_column("_phash_tag")
    assert valid.all() and len(np.unique(vals)) == 2 and (vals != 0).all()


def test_phash_field_outside_schema(ray_session, tmp_path):
    """A phash field that is NOT a schema field must still be read
    (review finding: the pruned column list dropped it and every
    partition task crashed on tbl.column)."""
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    pq.write_table(pa.table({
        "body": pa.array(["hello world", "goodbye world", "hello world"]),
        "author": pa.array(["ann", "bob", "ann"])}),
        str(tmp_path / "d.parquet"))
    s = IndexSchema()
    s.add_text_field("body")          # 'author' intentionally absent
    build_index(str(tmp_path / "d.parquet"), str(tmp_path / "idx"), s,
                num_shards=1, phash_fields=("author",))
    vals, valid = IndexReader(str(tmp_path / "idx")).fast_column(
        "_phash_author")
    assert valid.all() and len(np.unique(vals)) == 2
    assert vals[0] == vals[2] != vals[1]


def test_partition_filter_json_roundtrip(sf_dir):
    """to_json emits a real JSON AST and from_json reconstructs an
    equivalent filter (review finding: it returned a repr string)."""
    import json as _json

    from tantivy4java_ray.sources.partition_filter import PartitionFilter
    f = ((PartitionFilter.eq("event_type", "click")
          & PartitionFilter.gte("value", 10.0))
         | PartitionFilter.is_null("value"))
    ast = _json.loads(f.to_json())          # genuinely JSON
    assert ast[0] == "or"
    f2 = PartitionFilter.from_json(f.to_json())
    a = f.scan(f"{sf_dir}/events.parquet", columns=["event_id"])
    b = f2.scan(f"{sf_dir}/events.parquet", columns=["event_id"])
    assert a.num_rows == b.num_rows > 0
    assert a.column("event_id").to_pylist() == \
        b.column("event_id").to_pylist()


def test_delta_encoded_and_absolute_paths(tmp_path):
    """Delta add paths are URL-encoded; absolute URIs pass through
    (review finding: '%3A' reached the filesystem verbatim and absolute
    URIs were table-joined)."""
    import json as _json

    from tantivy4java_ray.sources.delta import delta_live_files
    d = tmp_path / "enc_delta"
    part = d / "ts=2024-01-01 00:00"
    part.mkdir(parents=True)
    (d / "_delta_log").mkdir()
    pq.write_table(pa.table({"x": pa.array([1])}),
                   str(part / "part-0.parquet"))
    enc = "ts=2024-01-01%2000%3A00/part-0.parquet"
    with open(d / "_delta_log" / f"{0:020d}.json", "w") as f:
        f.write(_json.dumps({"add": {"path": enc, "size": 1}}) + "\n")
        f.write(_json.dumps({"add": {
            "path": "s3://bucket/extern/part-9.parquet", "size": 1}})
            + "\n")
    files = delta_live_files(str(d))
    assert str(part / "part-0.parquet") in files
    assert "s3://bucket/extern/part-9.parquet" in files
    assert not any("%" in f for f in files)


def test_prewarm(renamed_index):
    renamed_index.prewarm()
    assert 0 in renamed_index._dicts


def test_term_set_and_dismax(renamed_index):
    docs, scores = renamed_index.evaluate(
        Query.term_set("body", ["hello", "goodbye"]))
    assert list(docs) == [0, 1]
    assert (scores == 1.0).all()  # const-score union
    d = Query.disjunction_max([Query.term("body", "hello"),
                               Query.term("body", "world")],
                              tie_breaker=0.5)
    docs, scores = renamed_index.evaluate(d)
    assert list(docs) == [0, 1]
    # doc0 matches both -> max + 0.5*other > doc1's single-term score
    assert scores[0] > scores[1]


def test_search_offset(renamed_index):
    full = renamed_index.search(Query.term("body", "world"), limit=2).hits
    off = renamed_index.search(Query.term("body", "world"), limit=1,
                               offset=1).hits
    assert off == full[1:]


def test_en_stem_analyzer():
    from tantivy4java_ray.analyzer import get_analyzer
    a = get_analyzer("en_stem")
    assert a.tokenize("Running quickly, Jumps!") == ["runn", "quick", "jump"]
