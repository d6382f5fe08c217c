"""Regressions for the round-4 self-review batch: writer lockfile
(tantivy LockBusy semantics), TEXT column shape pinned across flushes,
query-parser NoDefaultFieldDeclared + DOTALL range re-parse, Avro
namespace-aware named-type resolution, Delta version reconstructability.
"""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.pipelines.writer import IndexWriter
from tantivy4java_ray.query import Query, QueryParseError, parse_query
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_review_r4c"


@pytest.fixture(autouse=True, scope="module")
def _base(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    yield
    shutil.rmtree(BASE, ignore_errors=True)


def _schema():
    s = IndexSchema()
    s.add_text_field("text")
    s.add_integer_field("n")
    return s


# ---------------------------------------------------------------------------
# writer lockfile
# ---------------------------------------------------------------------------

def test_writer_lock_blocks_live_foreign_process():
    """A lockfile held by a LIVE other process refuses a second writer
    (the reference's tantivy directory lockfile: LockBusy)."""
    idx = f"{BASE}/idx_lock_live"
    # pid 1 is always alive; simulate a foreign live writer
    with open(idx + ".writer.lock", "w") as f:
        f.write("1:deadbeef")
    with pytest.raises(RuntimeError, match="locked by a live writer"):
        IndexWriter(idx, _schema())
    os.unlink(idx + ".writer.lock")


def test_writer_lock_steals_from_dead_process_and_releases():
    idx = f"{BASE}/idx_lock_dead"
    with open(idx + ".writer.lock", "w") as f:
        f.write("999999999:stale")          # no such pid
    w = IndexWriter(idx, _schema())          # steals the dead lock
    assert os.path.exists(idx + ".writer.lock")
    w.close()
    assert not os.path.exists(idx + ".writer.lock")
    # context-manager form releases too; same-process reopen is allowed
    with IndexWriter(idx, _schema()) as w2:
        assert w2._lock_token is not None
        IndexWriter(idx, _schema()).close()  # same-process steal: no raise
    assert not os.path.exists(idx + ".writer.lock")


def test_writer_close_does_not_release_anothers_lock():
    """close() only unlinks the lock it still owns — after a
    same-process steal the first writer's close must be a no-op."""
    idx = f"{BASE}/idx_lock_steal"
    w1 = IndexWriter(idx, _schema())
    w2 = IndexWriter(idx, _schema())         # steals w1's lock in-process
    w1.close()                               # token mismatch: keeps file
    assert os.path.exists(idx + ".writer.lock")
    w2.close()
    assert not os.path.exists(idx + ".writer.lock")


# ---------------------------------------------------------------------------
# TEXT shape pinned across flushes
# ---------------------------------------------------------------------------

def test_text_scalar_then_list_flush_fails_fast():
    """A later list-valued flush after scalar flushes must fail AT ADD
    time with a clear message, not at commit() on parquet schema
    unification."""
    idx = f"{BASE}/idx_shape_a"
    with IndexWriter(idx, _schema(), heap_docs=1) as w:
        w.add_document({"text": "alpha beta", "n": 1})     # flush 1: scalar
        with pytest.raises(TypeError, match="staged this TEXT field as "
                                            "scalar"):
            w.add_document({"text": ["gamma", "delta"], "n": 2})


def test_text_list_then_scalar_flush_wraps_losslessly():
    """list -> scalar is lossless: later scalar flushes wrap to
    single-element lists, the staged column type stays stable, and
    commit + search see every document."""
    idx = f"{BASE}/idx_shape_b"
    with IndexWriter(idx, _schema(), heap_docs=1, num_shards=1) as w:
        w.add_document({"text": ["alpha", "beta gamma"], "n": 1})
        w.add_document({"text": "delta epsilon", "n": 2})   # scalar: wrapped
        w.commit()
    r = IndexReader(idx)
    assert {d for _, d in r.search(Query.term("text", "delta"), 10).hits}
    assert {d for _, d in r.search(Query.term("text", "beta"), 10).hits}
    assert r.num_docs == 2


def test_text_shape_pin_survives_writer_reopen():
    """A reopened writer re-derives the pinned shape from the committed
    staged files, so it cannot stage an incompatible column type."""
    idx = f"{BASE}/idx_shape_c"
    with IndexWriter(idx, _schema(), heap_docs=1, num_shards=1) as w:
        w.add_document({"text": "alpha beta", "n": 1})
        w.commit()
    with IndexWriter(idx, _schema(), heap_docs=1) as w2:
        assert w2._text_mode.get("text") == "scalar"
        with pytest.raises(TypeError, match="scalar"):
            w2.add_document({"text": ["gamma"], "n": 2})


def test_text_mixed_shapes_in_one_flush_still_rejected():
    idx = f"{BASE}/idx_shape_d"
    with IndexWriter(idx, _schema(), heap_docs=10) as w:
        w.add_document({"text": "alpha", "n": 1})
        w.add_document({"text": ["beta"], "n": 2})
        with pytest.raises(TypeError, match="mixed scalar and list"):
            w._flush()


# ---------------------------------------------------------------------------
# query parser: NoDefaultFieldDeclared + DOTALL range re-parse
# ---------------------------------------------------------------------------

def test_parse_query_no_default_fields_errors():
    """tantivy's QueryParser raises NoDefaultFieldDeclared for an
    unfielded clause when the schema has no TEXT fields (rather than
    silently matching nothing) — query_parser.rs."""
    s = IndexSchema()
    s.add_integer_field("n")
    with pytest.raises(QueryParseError, match="no default fields"):
        parse_query("unfielded", s)
    # a FIELDED clause still parses fine
    q = parse_query("n:[1 TO 5]", s)
    assert q.kind == "range"
    # lenient mode survives instead of raising
    parse_query("unfielded AND n:3", s, lenient=True)


def test_parse_query_range_with_newline_bounds():
    """The lexer's range class accepts embedded newlines; the re-parse
    must too (pre-fix: m=None -> AttributeError even in lenient mode)."""
    s = _schema()
    q = parse_query("text:[a\nb TO c]", s)
    assert q.kind == "range"
    assert q.params[1] == "a\nb" and q.params[2] == "c"
    parse_query("text:[a\nb TO c]", s, lenient=True)   # no crash


# ---------------------------------------------------------------------------
# Avro namespace-aware named-type resolution
# ---------------------------------------------------------------------------

def test_avro_resolve_named_fullname_and_shortname():
    from tantivy4java_ray.sources.avro import _resolve_named
    sch = {"type": "record", "name": "outer", "namespace": "com.ex",
           "fields": [
               {"name": "a", "type": {"type": "record", "name": "inner",
                                      "fields": [{"name": "x",
                                                  "type": "long"}]}},
               {"name": "b", "type": "com.ex.inner"},     # fullname ref
               {"name": "c", "type": "inner"},            # short ref
               {"name": "d", "type": ["null", "com.ex.inner"]},
           ]}
    out = _resolve_named(sch, {})
    resolved = out["fields"][0]["type"]
    assert resolved["type"] == "record" and resolved["name"] == "inner"
    assert out["fields"][1]["type"] is resolved
    assert out["fields"][2]["type"] is resolved
    assert out["fields"][3]["type"][1] is resolved


def test_avro_resolve_named_dotted_name_and_alias():
    from tantivy4java_ray.sources.avro import _resolve_named
    sch = {"type": "record", "name": "ns2.rec", "fields": [
        {"name": "e", "type": {"type": "enum", "name": "col",
                               "aliases": ["colour"],
                               "namespace": "ns2",
                               "symbols": ["R", "G"]}},
        {"name": "f", "type": "ns2.col"},
        {"name": "g", "type": "ns2.colour"},              # alias fullname
        {"name": "h", "type": "ns2.rec"},                 # self by fullname
    ]}
    out = _resolve_named(sch, {})
    enum = out["fields"][0]["type"]
    assert out["fields"][1]["type"] is enum
    assert out["fields"][2]["type"] is enum
    assert out["fields"][3]["type"]["name"] == "ns2.rec"  # recursion ok


# ---------------------------------------------------------------------------
# Delta: unreachable requested version raises
# ---------------------------------------------------------------------------

def test_delta_unreachable_version_raises():
    from tantivy4java_ray.sources.delta import read_delta_snapshot
    d = f"{BASE}/delta_ver"
    os.makedirs(f"{d}/_delta_log")
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}),
                   f"{d}/part-0.parquet")
    schema_str = json.dumps({"type": "struct", "fields": [
        {"name": "x", "type": "long", "nullable": True, "metadata": {}}]})
    with open(f"{d}/_delta_log/00000000000000000000.json", "w") as f:
        f.write(json.dumps({"metaData": {"id": "t",
                                         "schemaString": schema_str}}) + "\n")
        f.write(json.dumps({"add": {"path": "part-0.parquet",
                                    "size": 1}}) + "\n")
    snap = read_delta_snapshot(d, version=0)
    assert len(snap.files) == 1
    with pytest.raises(ValueError, match="not reconstructable"):
        read_delta_snapshot(d, version=3)


def test_text_all_null_flush_pins_scalar():
    """An all-null flush stages a scalar string column, so it pins
    'scalar' — consistent with what reopen-pinning would read from the
    staged file's schema. A later list flush fails fast, not at commit."""
    idx = f"{BASE}/idx_shape_e"
    with IndexWriter(idx, _schema(), heap_docs=1) as w:
        w.add_document({"n": 1})              # no text: all-null flush
        with pytest.raises(TypeError, match="scalar"):
            w.add_document({"text": ["gamma"], "n": 2})


# ---------------------------------------------------------------------------
# review follow-ups: lock ordering/atomicity, rollback re-pin, avro ns
# precedence, rm sibling-sorting, _localize probe cache
# ---------------------------------------------------------------------------

def test_lock_checked_before_recovery_mutations():
    """A second writer must hit LockBusy BEFORE running commit-swap
    recovery: recovery unlinks markers and rmtree's swap leftovers a
    LIVE writer is mid-way through using."""
    idx = f"{BASE}/idx_lock_order"
    merged = f"{idx}.merged-live"
    os.makedirs(merged)
    marker = f"{idx}.swap.json"
    with open(marker, "w") as f:
        json.dump({"old": f"{idx}.old-x", "merged": merged,
                   "index_dir": idx}, f)
    with open(idx + ".writer.lock", "w") as f:
        f.write("1:live-holder")                 # pid 1: always alive
    with pytest.raises(RuntimeError, match="locked by a live writer"):
        IndexWriter(idx, _schema())
    # recovery must NOT have run: marker and merged dir untouched
    assert os.path.exists(marker)
    assert os.path.isdir(merged)
    os.unlink(idx + ".writer.lock")
    os.unlink(marker)
    shutil.rmtree(merged)


def _race_acquire(args):
    idx, barrier_ns = args
    import time
    # align attempts to one instant across processes
    while time.time_ns() < barrier_ns:
        time.sleep(0.001)
    try:
        w = IndexWriter(idx, _schema())
        time.sleep(2.0)                          # hold while others attempt
        w.close()
        return "won"
    except RuntimeError:
        return "busy"


def test_lock_acquisition_race_single_winner():
    """N processes racing to open a writer on the same index: exactly
    one wins. The whole read-verify-steal-claim runs under a flock'd
    side mutex and the token lands via atomic write-temp+rename — an
    unserialized claim has a two-winner interleave (a stale-lock
    removal momentarily empties the slot for a concurrent claimer)."""
    import multiprocessing as mp
    import time
    idx = f"{BASE}/idx_lock_race"
    n = 6
    barrier_ns = time.time_ns() + int(1.5e9)
    with mp.get_context("fork").Pool(n) as pool:
        results = pool.map(_race_acquire, [(idx, barrier_ns)] * n)
    assert results.count("won") == 1, results
    assert results.count("busy") == n - 1
    assert not os.path.exists(idx + ".writer.lock")


def test_rollback_resets_text_shape_pin():
    """rollback() deletes the staged files the pin came from; the pin
    must be re-derived so a rolled-back writer is no stricter than a
    freshly reopened one."""
    idx = f"{BASE}/idx_rollback_pin"
    with IndexWriter(idx, _schema(), heap_docs=1, num_shards=1) as w:
        w.add_document({"text": "alpha beta", "n": 1})    # pins scalar
        assert w._text_mode.get("text") == "scalar"
        w.rollback()
        assert "text" not in w._text_mode
        w.add_document({"text": ["gamma", "delta"], "n": 2})  # list: OK now
        w.commit()
    r = IndexReader(idx)
    assert r.num_docs == 1
    assert r.search(Query.term("text", "gamma"), 10).hits


def test_avro_short_name_resolves_in_enclosing_namespace():
    """Unqualified named-type refs resolve in the ENCLOSING namespace
    first (Avro spec), not against the last-registered global short
    name — two namespaces may reuse a short name."""
    from tantivy4java_ray.sources.avro import _resolve_named
    a_item = {"type": "record", "name": "item", "namespace": "a",
              "fields": [{"name": "x", "type": "long"}]}
    b_item = {"type": "record", "name": "item", "namespace": "b",
              "fields": [{"name": "y", "type": "string"}]}
    sch = {"type": "record", "name": "top", "namespace": "a", "fields": [
        {"name": "first", "type": a_item},
        {"name": "other", "type": {"type": "record", "name": "b.holder",
                                   "fields": [{"name": "i",
                                               "type": b_item}]}},
        # unqualified ref inside namespace 'a': must be a.item, even
        # though b.item registered the bare short name 'item' later
        {"name": "ref", "type": "item"},
    ]}
    out = _resolve_named(sch, {})
    ref = out["fields"][2]["type"]
    assert ref["namespace"] == "a" and \
        ref["fields"][0]["name"] == "x", ref


def test_localize_probes_once_per_table_marker(tmp_path):
    """The remap existence probe runs ONCE per (table, marker): on
    object-store tables a per-file probe is one HEAD per data file at
    plan time."""
    from tantivy4java_ray.sources import iceberg as ice
    tbl = tmp_path / "tbl_copy"
    (tbl / "data").mkdir(parents=True)
    for i in range(5):
        (tbl / "data" / f"f{i}.parquet").write_bytes(b"")
    calls = {"n": 0}
    from tantivy4java_ray import storage as st
    real = st.sexists

    def counting(p):
        calls["n"] += 1
        return real(p)

    ice._REMAP_CACHE.clear()
    st.sexists = counting
    try:
        for i in range(5):
            got = ice._localize(f"/old/home/tbl/data/f{i}.parquet",
                                str(tbl))
            assert got == str(tbl / "data" / f"f{i}.parquet")
    finally:
        st.sexists = real
        ice._REMAP_CACHE.clear()
    assert calls["n"] == 1, calls
    # reading in place never probes at all
    st_calls = {"n": 0}

    def counting2(p):
        st_calls["n"] += 1
        return real(p)

    st.sexists = counting2
    try:
        inplace = ice._localize(str(tbl / "data" / "f0.parquet"), str(tbl))
        assert inplace == str(tbl / "data" / "f0.parquet")
    finally:
        st.sexists = real
        ice._REMAP_CACHE.clear()
    assert st_calls["n"] == 0, st_calls


def test_dead_lock_steal_race_single_winner():
    """N processes racing to STEAL a pre-existing dead-pid lock: the
    blind-unlink protocol let two stealers both win (each unlinking the
    other's fresh claim); the verified-yank rename admits exactly one."""
    import multiprocessing as mp
    import time
    idx = f"{BASE}/idx_steal_race"
    # a genuinely dead pid: fork a child and reap it
    child = mp.get_context("fork").Process(target=lambda: None)
    child.start()
    dead_pid = child.pid
    child.join()
    with open(idx + ".writer.lock", "w") as f:
        f.write(f"{dead_pid}:stale-token")
    n = 6
    barrier_ns = time.time_ns() + int(1.5e9)
    with mp.get_context("fork").Pool(n) as pool:
        results = pool.map(_race_acquire, [(idx, barrier_ns)] * n)
    assert results.count("won") == 1, results
    assert results.count("busy") == n - 1
    assert not os.path.exists(idx + ".writer.lock")


def test_lock_mutex_world_writable_and_no_tmp_leak(tmp_path):
    # cross-user shared-index writers flock the same mutex: it must be
    # chmod'd past the umask; and a claimed lock leaves no .tmp litter
    import stat
    from tantivy4java_ray.pipelines.writer import IndexWriter
    from tantivy4java_ray.schema import IndexSchema
    s = IndexSchema()
    s.add_integer_field("doc_id", fast=True)
    s.add_text_field("text")
    idx = str(tmp_path / "idx")
    w = IndexWriter(idx, s)
    mutex = f"{w._lock_path}.mutex"
    assert os.path.exists(mutex)
    mode = stat.S_IMODE(os.stat(mutex).st_mode)
    assert mode == 0o666, oct(mode)
    parent = os.path.dirname(w._lock_path)
    assert not [f for f in os.listdir(parent) if ".tmp" in f]
    w.close()
    assert not os.path.exists(w._lock_path)


def test_empty_index_retrieve_docs_keeps_columns(ray_session, tmp_path):
    # zero-partition index: retrieve_docs must still return the
    # REQUESTED columns with schema-derived types, not an id-only table
    import pyarrow as pa
    from tantivy4java_ray.api import Index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.schema import IndexSchema
    s = IndexSchema()
    s.add_integer_field("doc_id", fast=True)
    s.add_text_field("text")
    docs = pa.table({"doc_id": pa.array([], pa.int64()),
                     "text": pa.array([], pa.string())})
    idx = str(tmp_path / "empty")
    Index.create_from_documents(docs, idx, schema=s, num_shards=2)
    r = IndexReader(idx)
    # an empty BUILD still records one 0-doc partition; the
    # partition-less shape occurs for manifests with no partitions at
    # all — drive the branch directly
    r.partitions = []
    tbl = r.retrieve_docs([], columns=["text"])
    assert tbl.num_rows == 0
    assert set(tbl.column_names) == {"text", "doc_id"}
    assert tbl.schema.field("text").type == pa.string()
    # doc_id among requested columns -> the id column renames to
    # __doc_id, same as the non-empty path
    tbl = r.retrieve_docs([], columns=["doc_id", "text"])
    assert "__doc_id" in tbl.column_names
