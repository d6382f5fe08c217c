"""Regressions for the corpus/filter fixes: Zipf head dominance, lang
coverage, typed partition-filter JSON roundtrip, fixed_size_binary
schema mapping."""

import collections
import datetime

import pyarrow as pa

from tantivy4java_ray.schema import FieldType, infer_index_schema
from tantivy4java_ray.sources.partition_filter import PartitionFilter
from tantivy4java_ray.sources.webpages import generate_webpages


def test_corpus_zipf_head_dominates():
    t = generate_webpages(3000)
    toks = collections.Counter()
    for s in t.column("text").to_pylist():
        if s:
            toks.update(s.split())
    top = toks.most_common(3)
    assert top[0][0] == "w0000"
    assert toks["w9999"] < toks["w0000"] / 10, \
        "clamped tail word dominates — Zipf shape broken"
    langs = set(t.column("lang").to_pylist())
    assert {"en", "de", "fr", ""} <= langs


def test_partition_filter_typed_json_roundtrip():
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    f = (PartitionFilter.gt("warc_ts", ts)
         & PartitionFilter.eq("key", b"\x00\xffbin"))
    f2 = PartitionFilter.from_json(f.to_json())
    assert str(f2.to_expression()) == str(f.to_expression())
    # filters actually prune rows
    tbl = pa.table({
        "warc_ts": pa.array([ts - datetime.timedelta(days=1),
                             ts + datetime.timedelta(days=1)],
                            pa.timestamp("us")),
        "key": pa.array([b"\x00\xffbin", b"\x00\xffbin"], pa.binary()),
        "v": pa.array([1, 2], pa.int64())})
    import pyarrow.dataset as pads
    got = pads.dataset(tbl).to_table(filter=f2.to_expression())
    assert got.column("v").to_pylist() == [2]


def test_fixed_size_binary_maps_to_bytes():
    sch = pa.schema([("id", pa.int64()), ("h", pa.binary(16))])
    idx = infer_index_schema(sch)
    assert idx.get_field("h").type is FieldType.BYTES
