"""Multi-valued TEXT position-gap semantics (tantivy segment writer:
positions continue across a document's values with a gap, so a phrase
can never match across a value boundary).

The old implementation joined values with '\\n' before tokenizing,
which made the last token of value k and the first token of value k+1
adjacent — a phrase spanning the boundary falsely matched."""

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.pipelines.build import (MULTIVALUE_POSITION_GAP,
                                              build_index)
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.pipelines.writer import IndexWriter
from tantivy4java_ray.query import Query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_mv_positions"


def _schema():
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_integer_field("n", fast=True)
    return s


@pytest.fixture(scope="module")
def idx(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    rows = [
        # doc 0: phrase WITHIN one value -> matches
        (["intro words", "alpha bravo charlie", "tail"], 0),
        # doc 1: same phrase SPLIT across values -> must NOT match
        (["starts alpha bravo", "charlie ends"], 1),
        # doc 2: split at the first boundary
        (["alpha", "bravo charlie"], 2),
        # doc 3: scalar-equivalent control via a single value
        (["alpha bravo charlie"], 3),
        # doc 4: terms present, never adjacent
        (["charlie alpha", "bravo"], 4),
    ]
    tbl = pa.table({
        "text": pa.array([r[0] for r in rows], pa.list_(pa.string())),
        "n": pa.array([r[1] for r in rows], pa.int64()),
    })
    import os
    os.makedirs(f"{BASE}/data", exist_ok=True)
    pq.write_table(tbl, f"{BASE}/data/mv.parquet")
    build_index([f"{BASE}/data/mv.parquet"], f"{BASE}/idx", _schema(),
                num_shards=2)
    yield IndexReader(f"{BASE}/idx")
    shutil.rmtree(BASE, ignore_errors=True)


def test_phrase_does_not_cross_value_boundary(idx):
    docs, _ = idx.evaluate(Query.phrase("text",
                                        ["alpha", "bravo", "charlie"]))
    assert docs.tolist() == [0, 3]


def test_terms_match_across_all_values(idx):
    for t in ("alpha", "bravo", "charlie"):
        docs, _ = idx.evaluate(Query.term("text", t))
        assert docs.tolist() == [0, 1, 2, 3, 4], t


def test_doc_length_counts_tokens_not_gaps(idx):
    # doc 0: 2 + 3 + 1 = 6 tokens; gaps are positions, not tokens
    from tantivy4java_ray.fieldnorm import FIELD_NORMS_TABLE
    norms = idx.norms("text")
    assert FIELD_NORMS_TABLE[norms[0]] >= 6
    assert FIELD_NORMS_TABLE[norms[3]] == 3


def test_slop_bridges_exactly_the_gap(idx):
    # value boundary costs GAP extra displacement: 'bravo charlie' split
    # as [... bravo] [charlie ...] needs slop >= GAP to match
    q_tight = Query.phrase("text", ["bravo", "charlie"],
                           slop=MULTIVALUE_POSITION_GAP - 1)
    q_bridge = Query.phrase("text", ["bravo", "charlie"],
                            slop=MULTIVALUE_POSITION_GAP)
    tight, _ = idx.evaluate(q_tight)
    bridge, _ = idx.evaluate(q_bridge)
    assert 1 not in tight.tolist()
    assert set(bridge.tolist()) >= set(tight.tolist())


def test_writer_list_docs_get_position_gap(ray_session):
    shutil.rmtree(f"{BASE}_w", ignore_errors=True)
    with IndexWriter(f"{BASE}_w/idx", _schema(), heap_docs=4,
                     num_shards=2) as w:
        w.add_document({"text": ["alpha bravo", "charlie delta"], "n": 0})
        w.add_document({"text": ["alpha bravo charlie"], "n": 1})
        w.commit()
    r = IndexReader(f"{BASE}_w/idx")
    docs, _ = r.evaluate(Query.phrase("text",
                                      ["bravo", "charlie"]))
    # doc 0 splits the pair across values (no match); doc 1 contains it
    # inside one value
    assert docs.tolist() == [1]
    docs, _ = r.evaluate(Query.phrase("text",
                                      ["alpha", "bravo", "charlie"]))
    assert docs.tolist() == [1]
    docs, _ = r.evaluate(Query.term("text", "delta"))
    assert docs.tolist() == [0]
    shutil.rmtree(f"{BASE}_w", ignore_errors=True)
