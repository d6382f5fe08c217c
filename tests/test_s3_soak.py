"""Emulated-object-store soak: the engine's full artifact path against an
in-process moto S3 server, with server-side request counting.

This is the sandbox stand-in for the reference's env-gated real-cloud
integration tests (reference ``RealS3EndToEndTest`` /
``split/SplitCacheManager.java:155-237`` credential+endpoint surface):
auth config via env (driver) AND via the worker-side conf file, ranged
reads, retry-on-5xx, multipart upload, and the L1/L2 cache GET budgets —
all counted at the SERVER, so Ray worker traffic is included.
"""

import json
import os
import threading
from wsgiref.simple_server import WSGIServer, WSGIRequestHandler, make_server

import pytest

from tantivy4java_ray.sources.s3boto import (CONF_DEFAULT,
                                             S3BotoFileSystem,
                                             ensure_registered)

BUCKET = "t4jr-soak"


class _Counter:
    """Server-side tally of S3 API traffic + bounded failure injection."""

    def __init__(self):
        self.lock = threading.Lock()
        self.counts: dict[str, int] = {}
        self.fail = {"method": None, "remaining": 0, "status": 500}

    def classify(self, environ) -> str:
        m = environ["REQUEST_METHOD"]
        q = environ.get("QUERY_STRING", "")
        path = environ.get("PATH_INFO", "")
        if m == "GET":
            is_obj = path.count("/") >= 2 and not path.endswith("/")
            if not is_obj or "list-type" in q:
                return "LIST"
            return "GET_RANGE" if environ.get("HTTP_RANGE") else "GET"
        if m == "POST" and "uploads" in q:
            return "MPU_CREATE"
        if m == "PUT" and "partNumber" in q:
            return "MPU_PART"
        if m == "PUT" and environ.get("HTTP_X_AMZ_COPY_SOURCE"):
            return "COPY"
        if m == "PUT" and environ.get("HTTP_IF_NONE_MATCH"):
            return "PUT_COND"
        if m == "DELETE" and "uploadId" in q:
            return "MPU_ABORT"
        return m

    def snapshot(self) -> dict[str, int]:
        with self.lock:
            return dict(self.counts)

    def gets_since(self, snap: dict[str, int]) -> int:
        cur = self.snapshot()
        return sum(cur.get(k, 0) - snap.get(k, 0)
                   for k in ("GET", "GET_RANGE"))


class _QuietHandler(WSGIRequestHandler):
    def log_message(self, *a):
        pass


class _ThreadingWSGIServer(WSGIServer):
    # moto's own ThreadedMotoServer uses a threaded werkzeug server; boto3
    # retries + Ray worker fan-in need concurrent request handling too
    import socketserver
    daemon_threads = True

    def process_request(self, request, client_address):
        t = threading.Thread(target=self._work,
                             args=(request, client_address), daemon=True)
        t.start()

    def _work(self, request, client_address):
        try:
            self.finish_request(request, client_address)
        except Exception:
            pass
        finally:
            self.shutdown_request(request)


@pytest.fixture(scope="module")
def s3_env(ray_session):
    from moto.moto_server.werkzeug_app import (DomainDispatcherApplication,
                                               create_backend_app)
    counter = _Counter()
    inner = DomainDispatcherApplication(create_backend_app)

    def app(environ, start_response):
        op = counter.classify(environ)
        with counter.lock:
            counter.counts[op] = counter.counts.get(op, 0) + 1
            inject = (counter.fail["remaining"] > 0
                      and environ["REQUEST_METHOD"] == counter.fail["method"])
            if inject:
                counter.fail["remaining"] -= 1
        if inject:
            status = counter.fail["status"]
            start_response(f"{status} Injected",
                           [("Content-Type", "application/xml")])
            return [b"<Error><Code>InternalError</Code>"
                    b"<Message>injected</Message></Error>"]
        return inner(environ, start_response)

    srv = make_server("127.0.0.1", 0, app, server_class=_ThreadingWSGIServer,
                      handler_class=_QuietHandler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    endpoint = f"http://127.0.0.1:{srv.server_port}"

    # driver-side config path: standard AWS env vars
    saved = {k: os.environ.get(k) for k in
             ("AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY",
              "AWS_ENDPOINT_URL", "AWS_DEFAULT_REGION")}
    os.environ.update({"AWS_ACCESS_KEY_ID": "t4jr-test-key",
                       "AWS_SECRET_ACCESS_KEY": "t4jr-test-secret",
                       "AWS_ENDPOINT_URL": endpoint,
                       "AWS_DEFAULT_REGION": "us-east-1"})
    # worker-side config path: Ray workers inherited the raylet's env from
    # cluster start (before this fixture ran), so they pick the endpoint up
    # from the conf side-file at filesystem construction time instead
    with open(CONF_DEFAULT, "w") as f:
        json.dump({"endpoint_url": endpoint, "key": "t4jr-test-key",
                   "secret": "t4jr-test-secret"}, f)
    S3BotoFileSystem.clear_instance_cache()
    ensure_registered()

    import boto3
    boto3.client("s3", endpoint_url=endpoint).create_bucket(Bucket=BUCKET)

    yield {"endpoint": endpoint, "counter": counter}

    srv.shutdown()
    os.remove(CONF_DEFAULT)
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    S3BotoFileSystem.clear_instance_cache()


def _fs() -> S3BotoFileSystem:
    S3BotoFileSystem.clear_instance_cache()
    return S3BotoFileSystem()


def test_fs_roundtrip(s3_env):
    fs = _fs()
    fs.pipe_file(f"{BUCKET}/a/b.bin", b"0123456789abcdef")
    assert fs.cat_file(f"{BUCKET}/a/b.bin") == b"0123456789abcdef"
    # ranged reads — the hot path for every index-component fetch
    assert fs.cat_file(f"{BUCKET}/a/b.bin", start=4, end=8) == b"4567"
    assert fs.cat_file(f"{BUCKET}/a/b.bin", start=-4) == b"cdef"
    assert fs.cat_file(f"{BUCKET}/a/b.bin", start=2, end=2) == b""
    assert fs.size(f"{BUCKET}/a/b.bin") == 16
    assert fs.exists(f"{BUCKET}/a/b.bin")
    assert fs.isdir(f"{BUCKET}/a")
    assert not fs.exists(f"{BUCKET}/a/nope")
    names = fs.ls(f"{BUCKET}/a", detail=False)
    assert names == [f"{BUCKET}/a/b.bin"]
    # mv = server-side copy + delete (sreplace's atomic-publish path)
    fs.mv(f"{BUCKET}/a/b.bin", f"{BUCKET}/a/c.bin")
    assert fs.cat_file(f"{BUCKET}/a/c.bin") == b"0123456789abcdef"
    assert not fs.exists(f"{BUCKET}/a/b.bin")
    assert s3_env["counter"].snapshot().get("COPY", 0) >= 1
    fs.rm(f"{BUCKET}/a", recursive=True)
    assert not fs.exists(f"{BUCKET}/a/c.bin")
    with pytest.raises(FileNotFoundError):
        fs.info(f"{BUCKET}/a/c.bin")
    # reads follow the fsspec missing-file contract too (put_if_absent's
    # 412 disambiguation catches FileNotFoundError from this path)
    with pytest.raises(FileNotFoundError):
        fs.cat_file(f"{BUCKET}/a/c.bin")
    with pytest.raises(FileNotFoundError):
        fs.cat_file(f"{BUCKET}/a/c.bin", start=0, end=4)


def test_multipart_upload(s3_env):
    MB = 1 << 20
    fs = _fs()
    # real S3 (and moto) reject non-final parts < 5 MiB — the fs clamps
    assert S3BotoFileSystem(multipart_chunksize=MB).multipart_chunksize \
        == 5 * MB
    fs.multipart_threshold = 5 * MB
    fs.multipart_chunksize = 5 * MB
    payload = bytes(range(256)) * 4096 * 11 + b"tail"  # 11 MiB + 4
    snap = s3_env["counter"].snapshot()
    with fs.open(f"{BUCKET}/big/obj.bin", "wb", block_size=5 * MB) as f:
        # write in uneven slices to exercise the _pending tail carry
        for i in range(0, len(payload), 3_000_001):
            f.write(payload[i:i + 3_000_001])
    cur = s3_env["counter"].snapshot()
    assert cur.get("MPU_CREATE", 0) - snap.get("MPU_CREATE", 0) == 1
    # 11 MiB at 5 MiB parts -> 2 full + 1 final tail
    assert cur.get("MPU_PART", 0) - snap.get("MPU_PART", 0) == 3
    assert fs.cat_file(f"{BUCKET}/big/obj.bin") == payload
    # streamed read through the buffered file (ranged GETs)
    with fs.open(f"{BUCKET}/big/obj.bin", "rb", block_size=MB) as f:
        assert f.read(10) == payload[:10]
        f.seek(7 * MB)
        assert f.read(16) == payload[7 * MB:7 * MB + 16]
    fs.rm_file(f"{BUCKET}/big/obj.bin")


def test_retry_on_injected_500(s3_env):
    fs = _fs()
    fs.pipe_file(f"{BUCKET}/r/x.bin", b"resilient")
    c = s3_env["counter"]
    with c.lock:
        c.fail.update({"method": "GET", "remaining": 2, "status": 500})
    # botocore standard retry mode must absorb both injected 500s
    assert fs.cat_file(f"{BUCKET}/r/x.bin") == b"resilient"
    with c.lock:
        assert c.fail["remaining"] == 0
    fs.rm_file(f"{BUCKET}/r/x.bin")


def test_build_search_soak(s3_env, tmp_path):
    """Full artifact path on the emulated store: distributed build writes
    the index to s3:// (worker-side conf auth), cold open+search within a
    GET budget, warm re-query = ZERO server-side GETs (L1 page cache)."""
    from tantivy4java_ray.sources.webpages import write_webpages
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.schema import IndexSchema

    data = str(tmp_path / "data")
    write_webpages(data, 1500, n_files=2, rows_per_row_group=500)
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("lang", fast=True)
    s.add_string_field("url", stored=True)  # docdata STORE component

    idx = f"s3://{BUCKET}/idx_soak"
    res = build_index(f"{data}/*.parquet", idx, s, num_shards=4,
                      target_docs_per_partition=500,
                      html_fallback=("text", "html"))
    assert res.num_docs == 1500

    c = s3_env["counter"]
    snap = c.snapshot()
    r = IndexReader(idx)
    hits = r.search("needleterm", 5)
    assert len(hits) == 5
    cold = c.gets_since(snap)
    assert cold > 0
    # cold budget: manifest + per-shard footer/hotcache reads + the query's
    # dictionary/posting pages; at 4 shards this lands well under 64 —
    # anything above means ranged reads degraded to per-component chatter
    assert cold <= 64, f"cold open+query took {cold} GETs"

    snap = c.snapshot()
    hits2 = r.search("needleterm", 5)
    assert [h[1] for h in hits2.hits] == [h[1] for h in hits.hits]
    assert c.gets_since(snap) == 0, "warm re-query must be zero-GET"

    # a different term may touch new pages but must reuse footer/dict pages
    snap = c.snapshot()
    r.search("w0042", 5)
    second_term = c.gets_since(snap)
    assert second_term <= 16, f"second term took {second_term} GETs"


def test_query_warmup_zero_get(s3_env, tmp_path):
    """warmup(query) must prefetch exactly what the query needs: after a
    warmup on a FRESH index (empty L1/L2 caches), executing the query
    issues zero additional server-side GETs."""
    from tantivy4java_ray.sources.webpages import write_webpages
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.schema import IndexSchema

    data = str(tmp_path / "wdata")
    write_webpages(data, 600, n_files=1, rows_per_row_group=300)
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("lang", fast=True)
    idx = f"s3://{BUCKET}/idx_warmq"
    build_index(f"{data}/*.parquet", idx, s, num_shards=2,
                target_docs_per_partition=300,
                html_fallback=("text", "html"))

    c = s3_env["counter"]
    r = IndexReader(idx)
    q = '(text:"alpha bravo charlie" OR w0042) AND NOT w0007'
    snap = c.snapshot()
    info = r.warmup(q)
    assert info["postings_runs"] > 0 and "text" in info["fields"]
    warm_gets = c.gets_since(snap)
    assert warm_gets > 0, "fresh index: warmup must actually fetch pages"
    snap = c.snapshot()
    hits = r.search(q, 10)
    assert len(hits) > 0
    assert c.gets_since(snap) == 0, \
        "query after query-shaped warmup must be zero-GET"
    # warmup of expansion kinds (fuzzy/wildcard/range) resolves matched
    # dictionary rows the same way evaluate does
    info2 = r.warmup("text:w0100~1 OR text:alp* OR lang:[aa TO zz]")
    assert info2["postings_runs"] > 0
    snap = c.snapshot()
    r.search("text:w0100~1 OR text:alp* OR lang:[aa TO zz]", 5)
    assert c.gets_since(snap) == 0


def test_validate_and_cli_on_s3(s3_env):
    """validate + agg surfaces over the s3:// index built above."""
    from tantivy4java_ray.pipelines.search import IndexReader, validate_index
    idx = f"s3://{BUCKET}/idx_soak"
    problems = validate_index(idx)
    assert problems == [], problems
    r = IndexReader(idx)
    agg = r.aggregate(None, {"l": {"terms": {"field": "lang", "size": 5}}})
    assert agg["l"]["buckets"], agg
    # STORE-component retrieval reads the docdata parquet straight from
    # s3 (source parquet not consulted); decoded blocks land in the
    # reader's doc-store LRU so a warm re-retrieval is ZERO-GET
    c = s3_env["counter"]
    snap = c.snapshot()
    tbl = r.retrieve_docs([0, 97, 194], from_store=True)
    assert tbl.num_rows == 3
    assert tbl.column("url").to_pylist() == [
        f"https://site{d % 1000}.example/page/{d}" for d in (0, 97, 194)]
    cold = c.gets_since(snap)
    assert cold > 0, "cold store retrieval must read docdata from s3"
    snap = c.snapshot()
    tbl2 = r.retrieve_docs([0, 97, 194, 291], from_store=True)
    assert tbl2.num_rows == 4
    assert c.gets_since(snap) <= 2, \
        "warm store retrieval re-decoded cached blocks from s3"
    snap = c.snapshot()
    r.retrieve_docs([0, 97, 194], from_store=True)
    assert c.gets_since(snap) == 0, "fully-warm retrieval must be zero-GET"


def test_conditional_put_claims(s3_env):
    """Txlog version claims on S3 are RACE-FREE via If-None-Match: * —
    of N concurrent different-content claims exactly one wins, the
    stored content is the winner's, and re-claiming identical content
    is idempotent-True (retried-request disambiguation)."""
    import threading
    from tantivy4java_ray.storage import write_bytes_if_absent
    fs = _fs()
    key = f"s3://{BUCKET}/txlog/v00000007.json"
    results = [None] * 8
    barrier = threading.Barrier(8)

    def claim(i):
        barrier.wait()
        results[i] = write_bytes_if_absent(b'{"writer": %d}' % i, key)
    ts = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sum(results) == 1, results
    winner = results.index(True)
    assert fs.cat_file(f"{BUCKET}/txlog/v00000007.json") \
        == b'{"writer": %d}' % winner
    # identical-content re-claim = True (a retry that actually landed)
    assert write_bytes_if_absent(b'{"writer": %d}' % winner, key)
    # different-content claim = False, content untouched
    assert not write_bytes_if_absent(b'{"writer": 99}', key)
    assert s3_env["counter"].snapshot().get("PUT_COND", 0) >= 10
    fs.rm_file(f"{BUCKET}/txlog/v00000007.json")


def test_exclusive_write_json_on_s3(s3_env):
    """The manifest-level claim API routes through the conditional put."""
    from tantivy4java_ray.state.manifest import exclusive_write_json
    path = f"s3://{BUCKET}/txlog2/v00000001.json"
    assert exclusive_write_json(path, {"txn": "a"})
    assert exclusive_write_json(path, {"txn": "a"})      # idempotent
    assert not exclusive_write_json(path, {"txn": "b"})  # lost the race
    fs = _fs()
    assert b'"txn": "a"' in fs.cat_file(f"{BUCKET}/txlog2/v00000001.json")


def test_sharded_pool_on_s3_warmup_zero_get(s3_env):
    """Distributed leaf/root search over the s3:// index: leaf actors
    (separate Ray worker processes, conf-file auth) warm a query shape,
    then serving it repeatedly is zero-GET at the server."""
    from tantivy4java_ray.pipelines.search import (IndexReader,
                                                   ShardedSearchPool)
    idx = f"s3://{BUCKET}/idx_soak"
    pool = ShardedSearchPool(idx, num_actors=2, prewarm=False)
    c = s3_env["counter"]
    q = "needleterm OR w0011"
    infos = pool.warmup(q)
    assert len(infos) == len(pool.ranges)
    snap = c.snapshot()
    res = pool.search_many([q] * 6, limit=5)
    assert all(res[0] == r for r in res)
    assert c.gets_since(snap) == 0, \
        "warmed sharded serving must issue no server GETs"
    expect = IndexReader(idx).search(q, 5).hits
    got = [(round(s, 4), d) for s, d in res[0]]
    assert got == [(round(s, 4), d) for s, d in expect]
    pool.shutdown()


def test_transactional_small_file_commit_and_discard(s3_env):
    """fsspec transaction semantics (autocommit=False): a small-file
    write stays invisible until commit() and vanishes on discard() —
    the body is deferred, never PUT at close."""
    fs = _fs()
    c = s3_env["counter"]
    p = f"{BUCKET}/txn/small.bin"
    snap = c.snapshot()
    f = fs.open(p, "wb", autocommit=False)
    f.write(b"hello transactional world")
    f.close()
    cur = c.snapshot()
    assert cur.get("PUT", 0) - snap.get("PUT", 0) == 0, \
        "transactional close must not PUT"
    assert cur.get("MPU_CREATE", 0) - snap.get("MPU_CREATE", 0) == 0, \
        "small transactional file must not open a multipart upload"
    assert not fs.exists(p)
    f.commit()
    assert fs.cat_file(p) == b"hello transactional world"
    fs.rm_file(p)

    p2 = f"{BUCKET}/txn/small2.bin"
    f = fs.open(p2, "wb", autocommit=False)
    f.write(b"never to be seen")
    f.close()
    f.discard()
    assert not fs.exists(p2)


def test_transactional_multipart_commit_and_abort(s3_env):
    """Above the multipart threshold, parts upload during the write
    (bounded memory) but the object only appears when commit()
    completes the MPU; discard() aborts it so no orphaned parts bill."""
    MB = 1 << 20
    fs = _fs()
    fs.multipart_threshold = 5 * MB
    fs.multipart_chunksize = 5 * MB
    c = s3_env["counter"]
    payload = bytes(range(256)) * 4096 * 6  # 6 MiB -> real MPU
    p = f"{BUCKET}/txn/big.bin"
    snap = c.snapshot()
    f = fs.open(p, "wb", block_size=5 * MB, autocommit=False)
    f.write(payload)
    f.close()
    cur = c.snapshot()
    assert cur.get("MPU_CREATE", 0) - snap.get("MPU_CREATE", 0) == 1
    assert cur.get("MPU_COMPLETE", 0) - snap.get("MPU_COMPLETE", 0) == 0
    assert not fs.exists(p), "uncompleted MPU must not be visible"
    f.commit()
    assert fs.cat_file(p) == payload
    fs.rm_file(p)

    p2 = f"{BUCKET}/txn/big2.bin"
    f = fs.open(p2, "wb", block_size=5 * MB, autocommit=False)
    f.write(payload)
    f.close()
    snap = c.snapshot()
    f.discard()
    cur = c.snapshot()
    assert cur.get("MPU_ABORT", 0) - snap.get("MPU_ABORT", 0) == 1
    assert not fs.exists(p2)


def test_rm_recursive_no_per_key_heads(s3_env):
    """Recursive delete detects prefixes from the sorted expansion, not
    with isdir() — a tree delete must not issue one HEAD per key."""
    fs = _fs()
    for i in range(24):
        fs.pipe_file(f"{BUCKET}/rmtree/d{i % 4}/f{i:02d}.bin", b"x")
    c = s3_env["counter"]
    snap = c.snapshot()
    fs.rm(f"{BUCKET}/rmtree", recursive=True)
    cur = c.snapshot()
    # expand_path may HEAD the root once; the regression was ~1 HEAD
    # (+LIST on miss) PER KEY, which at 24 keys would be >= 24 here
    assert cur.get("HEAD", 0) - snap.get("HEAD", 0) <= 2, \
        "rm must not HEAD each key to classify prefixes"
    fs.invalidate_cache()
    assert fs.find(f"{BUCKET}/rmtree") == []


def test_iceberg_localize_remaps_to_object_store(s3_env):
    """_localize must probe remap candidates with the storage layer's
    sexists, not os.path.exists: when the caller's table_path is an
    object-store URL the local check is always False and reads would
    silently fall back to the stale write-time URIs."""
    from tantivy4java_ray.sources.iceberg import _localize
    fs = _fs()
    fs.pipe_file(f"{BUCKET}/tbl/metadata/v1.json", b"{}")
    tbl = f"s3://{BUCKET}/tbl"
    assert _localize("file:///old/home/tbl/metadata/v1.json", tbl) == \
        f"s3://{BUCKET}/tbl/metadata/v1.json"
    # missing candidate falls back to the original location
    assert _localize("/old/home/tbl/data/zzz.parquet", tbl) == \
        "/old/home/tbl/data/zzz.parquet"
    fs.rm_file(f"{BUCKET}/tbl/metadata/v1.json")


def test_rm_prefix_with_dot_sibling(s3_env):
    """A sibling key sorting between a prefix and its first child
    ('d.txt' < 'd/...' because '.' < '/') must not break prefix
    classification — any later key under p/ makes p a prefix."""
    fs = _fs()
    fs.pipe_file(f"{BUCKET}/rmtree2/d.txt", b"sibling")
    for i in range(3):
        fs.pipe_file(f"{BUCKET}/rmtree2/d/f{i}.bin", b"x")
    fs.rm(f"{BUCKET}/rmtree2", recursive=True)
    fs.invalidate_cache()
    assert fs.find(f"{BUCKET}/rmtree2") == []


def test_checksums_on_s3(s3_env):
    """Integrity sidecar over the object store: generate + deep-verify
    against s3://, then detect a server-side overwrite of an artifact
    (the bit-rot / bad-multipart-assembly case the sidecar exists for)."""
    from tantivy4java_ray import storage as st
    from tantivy4java_ray.pipelines.integrity import (verify_checksums,
                                                      write_checksums)
    idx = f"s3://{BUCKET}/idx_soak"
    side = write_checksums(idx)
    assert any(k.endswith("postings.bin") for k in side["files"])
    assert verify_checksums(idx) == []
    victim = next(k for k in side["files"] if k.endswith("postings.bin"))
    orig = st.sopen(f"{idx}/{victim}", "rb").read()
    raw = bytearray(orig)
    raw[len(raw) // 2] ^= 0x04
    with st.sopen(f"{idx}/{victim}", "wb") as f:
        f.write(bytes(raw))
    probs = verify_checksums(idx)
    assert probs and victim in probs[0] and "crc32 mismatch" in probs[0]
    with st.sopen(f"{idx}/{victim}", "wb") as f:   # restore for later tests
        f.write(orig)
    assert verify_checksums(idx) == []
