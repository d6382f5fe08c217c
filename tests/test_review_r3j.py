"""Regressions for the driver/CLI/api review batch: content-addressed
document ingest (no stale reuse), searcher reload visibility, atomic IP
cache writes."""

import os

import pytest

from tantivy4java_ray.api import Index
from tantivy4java_ray.query import Query
from tantivy4java_ray.schema import IndexSchema


def _schema():
    s = IndexSchema()
    s.add_text_field("text", stored=True)
    s.add_integer_field("doc_id", fast=True)
    return s


def test_create_from_documents_reingest_rebuilds(ray_session, tmp_path):
    """Re-ingesting DIFFERENT docs with the same count into the same
    dir must rebuild, not serve the stale index against overwritten
    retrieval rows."""
    d = str(tmp_path / "idx")
    idx = Index.create_from_documents(
        [{"doc_id": 0, "text": "hello world"}], d, _schema(),
        num_shards=1)
    s = idx.searcher()
    assert len(s.search(Query.term("text", "hello")).hits) == 1
    idx2 = Index.create_from_documents(
        [{"doc_id": 0, "text": "goodbye world"}], d, _schema(),
        num_shards=1)
    s2 = idx2.searcher()
    assert len(s2.search(Query.term("text", "hello")).hits) == 0
    hits = s2.search(Query.term("text", "goodbye")).hits
    assert len(hits) == 1
    assert s2.doc(hits[0][1], ["text"])["text"] == "goodbye world"
    # identical content: third call is the idempotent fast path
    Index.create_from_documents(
        [{"doc_id": 0, "text": "goodbye world"}], d, _schema(),
        num_shards=1)


def test_searcher_observes_reload(ray_session, tmp_path):
    d = str(tmp_path / "idx_reload")
    idx = Index.create_from_documents(
        [{"doc_id": i, "text": "alpha"} for i in range(5)], d, _schema(),
        num_shards=1)
    s = idx.searcher()          # handed out BEFORE the commit
    assert s.num_docs() == 5
    w = idx.writer()
    w.add_document({"doc_id": 99, "text": "alpha fresh"})
    w.commit()
    idx.reload()
    assert s.num_docs() == 6, "stale reader after reload()"
    assert len(s.search(Query.term("text", "fresh")).hits) == 1
