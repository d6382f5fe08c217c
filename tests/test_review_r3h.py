"""Regressions for the sources/bundle review batch: Delta protocol
rejection, compaction-file filtering, partial checkpoints, Iceberg
snapshot lookup, Avro varint bounds, bundle footer validation, stale
split caches after rebuild."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.sources.avro import AvroError, _Reader
from tantivy4java_ray.sources.delta import (delta_versions,
                                            read_delta_snapshot)


def _write_commit(d, v, actions):
    with open(f"{d}/_delta_log/{v:020d}.json", "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


@pytest.fixture
def table(tmp_path):
    d = str(tmp_path / "tbl")
    os.makedirs(f"{d}/_delta_log")
    for name in ("a.parquet", "b.parquet"):
        pq.write_table(pa.table({"x": [1]}), f"{d}/{name}")
    _write_commit(d, 0, [
        {"metaData": {"id": "m", "schemaString": json.dumps(
            {"type": "struct", "fields": []})}},
        {"add": {"path": "a.parquet"}}])
    _write_commit(d, 1, [{"add": {"path": "b.parquet"}}])
    return d


def test_delta_rejects_unsupported_protocol(table):
    _write_commit(table, 2, [
        {"protocol": {"minReaderVersion": 3,
                      "readerFeatures": ["deletionVectors"]}}])
    with pytest.raises(ValueError, match="deletionVectors"):
        read_delta_snapshot(table)
    # a supported feature set passes
    _write_commit(table, 3, [
        {"protocol": {"minReaderVersion": 1}}])


def test_delta_ignores_compaction_and_v2_checkpoint_names(table):
    # these must NOT replay as commit files
    with open(f"{table}/_delta_log/"
              "00000000000000000000.00000000000000000003.compacted.json",
              "w") as f:
        f.write(json.dumps({"remove": {"path": "a.parquet"}}) + "\n")
    with open(f"{table}/_delta_log/"
              "00000000000000000001.checkpoint.0123abcd.json", "w") as f:
        f.write(json.dumps({"remove": {"path": "b.parquet"}}) + "\n")
    snap = read_delta_snapshot(table)
    assert {os.path.basename(p) for p in snap.files} == \
        {"a.parquet", "b.parquet"}
    assert delta_versions(table) == [0, 1]


def test_delta_partial_multipart_checkpoint_refused(table):
    cp = pa.table({
        "add": pa.array([{"path": "a.parquet"}],
                        pa.struct([("path", pa.string())]))})
    pq.write_table(
        cp, f"{table}/_delta_log/"
            "00000000000000000001.checkpoint.0000000001.0000000002.parquet")
    with pytest.raises(ValueError, match="1 of 2"):
        read_delta_snapshot(table)


def test_iceberg_snapshot_errors(tmp_path):
    from tantivy4java_ray.sources.iceberg import iceberg_live_files
    d = str(tmp_path / "ice")
    os.makedirs(f"{d}/metadata")
    meta = {"current-snapshot-id": -1,
            "snapshots": [{"snapshot-id": 7,
                           "manifest-list": f"{d}/metadata/missing.avro"}]}
    with open(f"{d}/metadata/v1.metadata.json", "w") as f:
        json.dump(meta, f)
    # -1 sentinel falls back to the last snapshot (then fails on the
    # missing avro, which is fine) — but an unknown id is a clear error
    with pytest.raises(ValueError, match="snapshot 99 not found"):
        iceberg_live_files(d, snapshot_id=99)


def test_avro_truncated_varint_raises_avro_error():
    r = _Reader(b"\x80\x80")          # truncated continuation run
    with pytest.raises(AvroError, match="EOF"):
        r.read_long()
    r = _Reader(b"\x80" * 11 + b"\x01")   # > 64-bit varint
    with pytest.raises(AvroError, match="varint"):
        r.read_long()


def test_bundle_footer_length_validated(tmp_path):
    import struct

    from tantivy4java_ray.pipelines.bundle import MAGIC, read_bundle_footer
    p = str(tmp_path / "bad.split")
    with open(p, "wb") as f:
        f.write(b"x" * 20)
        f.write(struct.pack("<QI", 10_000, MAGIC))  # flen > size
    with pytest.raises(ValueError, match="footer length"):
        read_bundle_footer(p)


def test_bundle_rebuild_not_served_from_stale_cache(ray_session, tmp_path):
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.bundle import bundle_index, split_url
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema

    src1 = str(tmp_path / "a.parquet")
    src2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"text": ["alpha beta"] * 10}), src1)
    pq.write_table(pa.table({"text": ["gamma delta"] * 25}), src2)
    s = IndexSchema().add_text_field("text")
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "web.split")
    build_index(src1, idx, s, num_shards=1)
    bundle_index(idx, out)
    r = IndexReader(split_url(out))
    assert len(r.evaluate(Query.term("text", "alpha"))[0]) == 10
    # rebuild the index with different content, re-bundle to the SAME
    # path, and reopen: the new footer must be served, not the cached one
    build_index(src2, idx, s, num_shards=1)
    bundle_index(idx, out)
    r2 = IndexReader(split_url(out))
    assert len(r2.evaluate(Query.term("text", "gamma"))[0]) == 25
    assert len(r2.evaluate(Query.term("text", "alpha"))[0]) == 0
