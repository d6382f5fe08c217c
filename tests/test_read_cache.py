"""Byte-range LRU + GET coalescing (round-3; the reference's L1 cache
and request consolidation, ``SplitCacheManager.java:560-739``,
``BATCH_OPTIMIZATION_DEVELOPERS_GUIDE.md:900-947``)."""

import os

import numpy as np
import pytest

from tantivy4java_ray.storage import RangedBlob


class CountingFS:
    """Minimal fsspec-like fs over one in-memory blob."""

    def __init__(self, data: bytes):
        self.data = data
        self.calls: list[tuple[int, int]] = []

    def size(self, path):
        return len(self.data)

    def cat_file(self, path, start=0, end=None):
        self.calls.append((start, end))
        return self.data[start:end]

    def cat_ranges(self, paths, starts, ends, on_error="return"):
        # the engine must pass on_error="raise": fsspec's default
        # "return" hands back Exception OBJECTS as page bytes
        assert on_error == "raise"
        out = []
        for s, e in zip(starts, ends):
            self.calls.append((s, e))
            out.append(self.data[s:e])
        return out


def test_ranged_blob_page_cache_and_coalescing():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 1_000_000, np.uint8).tobytes()
    fs = CountingFS(data)
    blob = RangedBlob(fs, "x", page_size=4096, cache_pages=64)

    # two adjacent small runs in the same page -> ONE GET total
    a = blob[100:200]
    b = blob[300:500]
    assert bytes(a) == data[100:200] and bytes(b) == data[300:500]
    assert blob.gets == 1

    # repeat reads -> zero additional GETs (warm path)
    blob[100:200]
    blob[300:500]
    assert blob.gets == 1

    # a run spanning page boundary: consecutive missing pages coalesce
    c = blob[8000:17000]
    assert bytes(c) == data[8000:17000]
    assert blob.gets == 2  # one coalesced GET for pages 1..4

    # scattered prefetch: 3 runs -> grouped into <= 3 GETs, then every
    # covered read is free
    g0 = blob.gets
    blob.prefetch([(50_000, 50_100), (50_200, 50_300), (800_000, 800_050)])
    assert blob.gets - g0 <= 2  # first two runs share a page group
    blob[50_000:50_100]
    blob[800_000:800_050]
    assert blob.gets - g0 <= 2

    # LRU eviction keeps the cache bounded
    for i in range(0, 600_000, 4096):
        blob[i:i + 10]
    assert len(blob._pages) <= 64


def test_ranged_blob_read_larger_than_cache():
    """A single read spanning more pages than the cache capacity must
    succeed (the in-flight span is pinned during eviction) and the
    cache must drop back to its cap on the next operation."""
    data = bytes(range(256)) * 64  # 16 KiB
    fs = CountingFS(data)
    blob = RangedBlob(fs, "x", page_size=1024, cache_pages=4)
    out = blob[0:10240]  # 10 pages > 4-page cache
    assert bytes(out) == data[:10240]
    # next small read trims back under the cap (+ its own span)
    blob[15_000:15_010]
    assert len(blob._pages) <= 4


def test_ranged_blob_eof_clamp():
    data = bytes(range(100)) * 10
    fs = CountingFS(data)
    blob = RangedBlob(fs, "x", page_size=256)
    out = blob[900:5000]  # stop beyond EOF clamps
    assert bytes(out) == data[900:]
    assert len(blob) == 1000


def test_ranged_blob_negative_slices():
    """np.memmap-style end-relative slicing (blob[-12:] previously
    computed page -1 and issued a negative-offset GET)."""
    data = bytes(range(256)) * 8
    blob = RangedBlob(CountingFS(data), "x", page_size=256)
    assert bytes(blob[-12:]) == data[-12:]
    assert bytes(blob[-100:-4]) == data[-100:-4]
    assert bytes(blob[:-2000]) == data[:-2000]
    assert bytes(blob[-4:-8]) == b""


def test_disk_page_cache_rewarm_zero_gets(tmp_path):
    """L2 disk tier: a FRESH RangedBlob (cold memory LRU, e.g. a
    restarted actor) over the same object re-warms from node-local disk
    with ZERO network GETs."""
    from tantivy4java_ray.storage import DiskPageCache

    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 300_000, np.uint8).tobytes()
    cache = DiskPageCache(root=str(tmp_path / "l2"), max_bytes=1 << 30)

    fs1 = CountingFS(data)
    b1 = RangedBlob(fs1, "s3://bkt/x", page_size=4096, disk_cache=cache)
    assert bytes(b1[100:9000]) == data[100:9000]
    assert bytes(b1[200_000:200_500]) == data[200_000:200_500]
    assert b1.gets == 2 and b1.disk_hits == 0

    fs2 = CountingFS(data)
    b2 = RangedBlob(fs2, "s3://bkt/x", page_size=4096, disk_cache=cache)
    assert bytes(b2[100:9000]) == data[100:9000]
    assert bytes(b2[200_000:200_500]) == data[200_000:200_500]
    assert b2.gets == 0 and b2.disk_hits > 0 and not fs2.calls

    # a range only partially on disk fetches just the missing pages
    b3 = RangedBlob(CountingFS(data), "s3://bkt/x", page_size=4096,
                    disk_cache=cache)
    out = b3[8000:20_000]  # pages 1,2 cached; 3,4 are not
    assert bytes(out) == data[8000:20_000]
    assert b3.gets == 1 and b3.disk_hits == 2

    # a different object (different size -> different key) never
    # collides
    other = data[:150_000]
    b4 = RangedBlob(CountingFS(other), "s3://bkt/x", page_size=4096,
                    disk_cache=cache)
    assert bytes(b4[100:9000]) == other[100:9000]
    assert b4.disk_hits == 0


def test_disk_page_cache_eviction_budget(tmp_path):
    from tantivy4java_ray.storage import DiskPageCache

    cache = DiskPageCache(root=str(tmp_path / "l2"), max_bytes=64 * 1024)
    data = np.random.default_rng(2).integers(
        0, 256, 512 * 1024, np.uint8).tobytes()
    blob = RangedBlob(CountingFS(data), "s3://bkt/big", page_size=4096,
                      disk_cache=cache)
    for i in range(0, len(data), 4096):
        blob[i:i + 16]
    cache.evict()
    total = sum(os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(cache.root) for f in fs)
    assert total <= 64 * 1024


def test_disk_cache_protocol_gating(tmp_path):
    """file://, memory:// and t4jrsplit:// never get an L2 disk copy;
    real object-store protocols do (and T4JR_DISK_CACHE=0 disables)."""
    import fsspec

    from tantivy4java_ray.storage import _disk_cache_for

    assert _disk_cache_for(fsspec.filesystem("memory")) is None
    assert _disk_cache_for(fsspec.filesystem("file")) is None

    class FakeS3:
        protocol = ("s3", "s3a")

    assert _disk_cache_for(FakeS3()) is not None
    os.environ["T4JR_DISK_CACHE"] = "0"
    try:
        assert _disk_cache_for(FakeS3()) is None
    finally:
        del os.environ["T4JR_DISK_CACHE"]


def test_memory_index_query_get_counts(ray_session, tmp_path):
    """3-term bool + wildcard over a memory://-resident index: posting
    reads are coalesced per term, and a REPEAT query issues ZERO new
    byte-range GETs (postings LRU + page LRU)."""
    import fsspec

    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.query import Occur, Query
    from tantivy4java_ray.schema import IndexSchema
    from tantivy4java_ray.sources.webpages import write_webpages

    write_webpages(str(tmp_path / "data"), 400, n_files=1,
                   rows_per_row_group=200)
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    build_index(str(tmp_path / "data"), str(tmp_path / "idx"), s,
                target_docs_per_partition=200, num_shards=2)
    # copy the built index into the (process-local) memory filesystem
    mem = fsspec.filesystem("memory")
    for root, _dirs, files in os.walk(tmp_path / "idx"):
        for f in files:
            p = os.path.join(root, f)
            rel = os.path.relpath(p, tmp_path / "idx")
            with open(p, "rb") as fh:
                mem.pipe_file(f"/t4jr_idx/{rel}", fh.read())

    r = IndexReader("memory://t4jr_idx")
    q = Query.boolean([
        (Occur.SHOULD, Query.term("text", "alpha")),
        (Occur.SHOULD, Query.term("text", "bravo")),
        (Occur.SHOULD, Query.term("text", "charlie")),
    ])
    docs, _ = r.evaluate(q)
    assert len(docs) > 0
    wdocs = r.match_terms("text", "regex", pattern="need.*")
    gets_after = sum(r._mm(sid).gets for sid in r._post_mm)
    assert gets_after >= 1
    # warm repeat: no new byte-range requests at all
    docs2, _ = r.evaluate(q)
    r.match_terms("text", "regex", pattern="need.*")
    assert sum(r._mm(sid).gets for sid in r._post_mm) == gets_after
    assert list(docs2) == list(docs) and len(wdocs) >= 0


def test_cache_stats_surface(ray_session, tmp_path):
    """IndexReader.cache_stats(): hit/miss counters move with repeat
    queries (getCacheStats analog, SplitCacheManager.java:983-1005)."""
    from tantivy4java_ray.pipelines.build import build_index
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.query import Query
    from tantivy4java_ray.schema import IndexSchema
    from tantivy4java_ray.sources.webpages import write_webpages

    write_webpages(str(tmp_path / "data"), 400, n_files=1,
                   rows_per_row_group=200)
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    build_index(str(tmp_path / "data"), str(tmp_path / "idx"), s,
                target_docs_per_partition=200, num_shards=2)
    r = IndexReader(str(tmp_path / "idx"))
    st0 = r.cache_stats()
    assert st0["postings"] == {"hits": 0, "misses": 0, "entries": 0,
                               "bytes": 0,
                               "max_bytes": r.postings_cache_max}
    r.evaluate(Query.term("text", "needleterm"))
    st1 = r.cache_stats()
    assert st1["postings"]["misses"] == 1
    assert st1["postings"]["entries"] == 1
    r.evaluate(Query.term("text", "needleterm"))
    st2 = r.cache_stats()
    assert st2["postings"]["hits"] >= 1
    # automaton union: first query misses, repeat hits
    r.evaluate(Query.wildcard("text", "need*"))
    r.evaluate(Query.wildcard("text", "need*"))
    st3 = r.cache_stats()
    assert st3["union"]["misses"] >= 1 and st3["union"]["hits"] >= 1
    assert st3["remote"] == {"ranged_gets": 0, "disk_cache_hits": 0}
