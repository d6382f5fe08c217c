"""Stored-field retrieval (STORE component), CLI, and error paths."""

import json
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.query import Query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_store"


@pytest.fixture(scope="module")
def stored_index(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    pq.write_table(pa.table({
        "title": pa.array(["alpha one", "beta two", "gamma three"]),
        "url": pa.array(["u0", "u1", "u2"])}),
        f"{BASE}/docs.parquet")
    s = IndexSchema()
    s.add_text_field("title", stored=True)
    s.add_string_field("url", stored=True)
    build_index(f"{BASE}/docs.parquet", f"{BASE}/idx", s, num_shards=1)
    return f"{BASE}/idx"


def test_retrieve_from_store_without_source(stored_index):
    r = IndexReader(stored_index)
    # stored retrieval must not need the source parquet
    moved = f"{BASE}/docs.parquet.bak"
    os.rename(f"{BASE}/docs.parquet", moved)
    try:
        tbl = r.retrieve_docs([2, 0], from_store=True)
        assert tbl.column("title").to_pylist() == ["gamma three", "alpha one"]
        assert tbl.column("url").to_pylist() == ["u2", "u0"]
    finally:
        os.rename(moved, f"{BASE}/docs.parquet")


def test_cli_search_and_validate(stored_index):
    env = {**os.environ}
    out = subprocess.run(
        [sys.executable, "-m", "tantivy4java_ray", "search", stored_index,
         "title:beta", "-k", "3"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=120)
    rows = json.loads(out.stdout.strip().splitlines()[-1])
    assert rows[0]["doc_id"] == 1
    out = subprocess.run(
        [sys.executable, "-m", "tantivy4java_ray", "search", stored_index,
         "title:beta", "-k", "1", "--snippet", "title"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=120)
    rows = json.loads(out.stdout.strip().splitlines()[-1])
    assert "<b>beta</b>" in rows[0]["snippet"]
    out = subprocess.run(
        [sys.executable, "-m", "tantivy4java_ray", "validate", stored_index],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert json.loads(out.stdout.strip().splitlines()[-1])["valid"]
    out = subprocess.run(
        [sys.executable, "-m", "tantivy4java_ray", "info", stored_index],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert json.loads(out.stdout)["num_docs"] == 3


def test_error_paths(stored_index, ray_session):
    r = IndexReader(stored_index)
    with pytest.raises(KeyError):
        r.evaluate(Query.term("nosuch", "x"))
    with pytest.raises(FileNotFoundError):
        build_index("/nonexistent/*.parquet", f"{BASE}/nope")
    from tantivy4java_ray.pipelines.merge import merge_indexes
    with pytest.raises(ValueError, match="corrupt merge input"):
        merge_indexes(["/nonexistent_idx"], f"{BASE}/nope2")


def test_phrase_requires_positions(ray_session):
    """index_option gating: 'freq' stores tf but no positions."""
    d = f"{BASE}/freq"
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({"t": pa.array(["a b c"])}), f"{d}/x.parquet")
    s = IndexSchema()
    s.add_text_field("t", index_option="freq")
    build_index(f"{d}/x.parquet", f"{d}/idx", s, num_shards=1)
    r = IndexReader(f"{d}/idx")
    assert r.doc_freq("t", "b") == 1
    with pytest.raises(ValueError, match="position"):
        r.evaluate(Query.phrase("t", ["a", "b"]))
