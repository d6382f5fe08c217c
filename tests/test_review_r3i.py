"""Regressions for the post-processing review batch: stemmed/raw-field
snippets, per-field highlight terms, budgeted snippet backoff, fuzzy
highlight seeds, string-key top-k with nulls, empty-batch multimodal
stages, 10-bit y4m rejection, null-payload errors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from tantivy4java_ray.functions.snippet import SnippetGenerator
from tantivy4java_ray.functions.topk import _block_topk, topk
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.stages.multimodal import (AudioFrameSample,
                                                ImageDecodeResize,
                                                VideoFrameSample,
                                                decode_y4m_frames)


def test_snippet_stemmed_field():
    q = Query.term("text", "runn")      # what parse_query stores for
    gen = SnippetGenerator(q, "text", "en_stem")
    s = gen.snippet_from_text("he was running far away")
    assert "<b>running</b>" in s


def test_snippet_raw_field_case_sensitive():
    q = Query.term("tag", "Apple")
    gen = SnippetGenerator(q, "tag", "raw")
    assert "<b>Apple</b>" in gen.snippet_from_text("one Apple here")
    assert gen.snippet_from_text("one apple here") == ""


def test_snippet_terms_scoped_to_field():
    q = Query.boolean([(Occur.MUST, Query.term("title", "zebra")),
                       (Occur.MUST, Query.term("text", "apple"))])
    gen = SnippetGenerator(q, "text")
    s = gen.snippet_from_text("a zebra ate an apple")
    assert "<b>apple</b>" in s and "<b>zebra</b>" not in s


def test_snippet_backoff_budgeted():
    gen = SnippetGenerator(Query.term("text", "alpha"), "text",
                           max_chars=22)
    s = gen.snippet_from_text("aaaaaaaaaaaaaaaaaaaa alpha bbbb")
    assert "<b>alpha</b>" in s


def test_snippet_fuzzy_seed_term():
    q = Query.fuzzy_term("text", "apple", 1)
    gen = SnippetGenerator(q, "text")
    assert "<b>apple</b>" in gen.snippet_from_text("an apple a day")


def test_block_topk_null_string_keys():
    t = pa.table({"k": pa.array(["b", None, "a", "c"]),
                  "id": pa.array([1, 2, 3, 4], pa.int64())})
    out = _block_topk(t, "k", 2, True, ("id",))
    assert out.column("k").to_pylist() == ["c", "b"]
    # null tie columns survive too
    t2 = pa.table({"k": pa.array([5, 3, 5], pa.int64()),
                   "t": pa.array(["x", None, None])})
    out2 = _block_topk(t2, "k", 2, True, ("t",))
    assert out2.column("k").to_pylist() == [5, 5]


def test_topk_dataset_null_string_keys(ray_session):
    df = pd.DataFrame({"k": ["b", None, "a", "c", None, "d"],
                       "id": range(6)})
    got = topk(ray.data.from_pandas(df).repartition(3), "k", 2,
               tie_cols=("id",))
    assert got["k"].tolist() == ["d", "c"]


def test_multimodal_empty_batch():
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "image": pa.array([], pa.binary()),
                      "audio": pa.array([], pa.binary()),
                      "video": pa.array([], pa.binary())})
    assert ImageDecodeResize(fake=True)(empty).num_rows == 0
    assert AudioFrameSample(fake=True)(empty).num_rows == 0
    assert VideoFrameSample(fake=True)(empty).num_rows == 0


def test_y4m_rejects_10bit():
    hdr = b"YUV4MPEG2 W4 H4 C420p10\n"
    payload = hdr + b"FRAME\n" + bytes(4 * 4 * 3)
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m_frames(payload, 1)
    # plain and tagged 8-bit forms still decode
    for cs in (b"C420", b"C420jpeg"):
        p = b"YUV4MPEG2 W4 H4 " + cs + b"\nFRAME\n" + bytes(4 * 4 * 3 // 2)
        assert decode_y4m_frames(p, 1).shape == (1, 4, 4, 3)


def test_null_payload_clear_error():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "image": pa.array([None], pa.binary())})
    with pytest.raises(ValueError, match="null/empty 'image'"):
        ImageDecodeResize()(t)
