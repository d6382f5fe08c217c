"""Merge + resume fixtures (FIXTURES.md F6): two disjoint slices built as
separate indexes then merged must equal a single-shot build of the union;
a killed/re-run build must skip finished partitions and produce identical
results."""

import glob
import os
import shutil

import numpy as np
import pytest

from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.merge import merge_indexes
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.sources.webpages import write_webpages
from tantivy4java_ray.schema import IndexSchema

BASE = "/tmp/t4jr_merge"


def schema():
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("lang", fast=True)
    s.add_date_field("warc_ts", fast=True)
    return s


@pytest.fixture(scope="module")
def setup(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    # two disjoint 1k-row slices, contiguous doc ids
    write_webpages(f"{BASE}/data_a", 600, n_files=1, rows_per_row_group=200)
    # slice B continues doc ids at 600 so the union equals one 1200-doc corpus
    from tantivy4java_ray.sources.webpages import generate_webpages
    import pyarrow.parquet as pq
    os.makedirs(f"{BASE}/data_b", exist_ok=True)
    pq.write_table(generate_webpages(600, start_doc_id=600),
                   f"{BASE}/data_b/webpages-0000.parquet", row_group_size=200)

    # keep_partials: the partial-resume test below simulates a crash by
    # copying this index's map-stage outputs (deleted on commit by default)
    build_index(f"{BASE}/data_a", f"{BASE}/idx_a", schema(),
                html_fallback=("text", "html"),
                target_docs_per_partition=300, num_shards=4,
                keep_partials=True)
    build_index(f"{BASE}/data_b", f"{BASE}/idx_b", schema(),
                html_fallback=("text", "html"),
                target_docs_per_partition=300, num_shards=4)
    # default builds drop the ~index-sized external-shuffle partials
    # once committed; keep_partials retains them
    assert not os.path.exists(f"{BASE}/idx_b/_partials")
    assert os.path.exists(f"{BASE}/idx_a/_partials")
    both = sorted(glob.glob(f"{BASE}/data_a/*.parquet")) + \
        sorted(glob.glob(f"{BASE}/data_b/*.parquet"))
    build_index(both, f"{BASE}/idx_union", schema(),
                html_fallback=("text", "html"),
                target_docs_per_partition=300, num_shards=4)
    merge_indexes([f"{BASE}/idx_a", f"{BASE}/idx_b"], f"{BASE}/idx_merged")
    return None


QUERIES = ["needleterm", "w0000 AND w0042", 'text:"alpha bravo charlie"',
           "w0123 OR w0456", "lang:de"]


def test_merged_equals_single_shot(setup):
    rm = IndexReader(f"{BASE}/idx_merged")
    ru = IndexReader(f"{BASE}/idx_union")
    assert rm.num_docs == ru.num_docs == 1200
    for q in QUERIES:
        assert rm.search(q, 20).hits == ru.search(q, 20).hits, q
    assert rm.doc_freq("text", "w0000") == ru.doc_freq("text", "w0000")


def test_merge_with_deletes(setup):
    out = f"{BASE}/idx_del"
    shutil.rmtree(out, ignore_errors=True)
    res = merge_indexes([f"{BASE}/idx_a", f"{BASE}/idx_b"], out,
                        delete_queries=[Query.term("text", "needleterm")])
    r = IndexReader(out)
    ru = IndexReader(f"{BASE}/idx_union")
    marker_docs, _ = ru.evaluate(Query.term("text", "needleterm"))
    assert res.num_deleted == len(marker_docs)
    # deleted docs gone from postings
    assert r.doc_freq("text", "needleterm") == 0
    d, _ = r.evaluate(Query.term("text", "w0000"))
    du, _ = ru.evaluate(Query.term("text", "w0000"))
    assert set(du) - set(d) == set(du) & set(marker_docs)
    # and from fast-field matches
    dr, _ = r.evaluate(Query.range("warc_ts", None, None))
    assert set(dr) & set(marker_docs) == set()


def test_plain_merge_carries_tombstones(setup):
    """A plain merge (no delete_queries) of an index that already has
    tombstones must NOT resurrect the deleted docs on fast-field /
    match-all paths (regression: review finding, writer.commit path)."""
    src = f"{BASE}/idx_del"
    if not os.path.exists(os.path.join(src, "manifest.json")):
        merge_indexes([f"{BASE}/idx_a", f"{BASE}/idx_b"], src,
                      delete_queries=[Query.term("text", "needleterm")])
    out = f"{BASE}/idx_del_remerged"
    shutil.rmtree(out, ignore_errors=True)
    merge_indexes([src], out)
    r = IndexReader(out)
    ru = IndexReader(f"{BASE}/idx_union")
    marker_docs, _ = ru.evaluate(Query.term("text", "needleterm"))
    assert r.deleted is not None and len(r.deleted) == len(marker_docs)
    dr, _ = r.evaluate(Query.range("warc_ts", None, None))
    assert set(dr) & set(marker_docs) == set()
    # aggregations over the remerged index also exclude them
    from tantivy4java_ray.aggs import run_aggregations_on_index
    agg = run_aggregations_on_index(
        r, None, {"n": {"value_count": {"field": "warc_ts"}}},
        distributed=False)
    assert agg["n"]["value"] == 1200 - len(marker_docs)


def test_resume_skips_finished_partitions(setup):
    """Re-running a build must not recompute finished partitions and must
    produce byte-identical search results."""
    idx = f"{BASE}/idx_a"
    mtimes = {p: os.path.getmtime(p)
              for p in glob.glob(f"{idx}/docdata/*.parquet")}
    r_before = IndexReader(idx).search("needleterm", 10).hits
    res2 = build_index(f"{BASE}/data_a", idx, schema(),
                       html_fallback=("text", "html"),
                       target_docs_per_partition=300, num_shards=4)
    assert res2.resumed_partitions == res2.num_partitions
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t, f"partition recomputed: {p}"
    assert IndexReader(idx).search("needleterm", 10).hits == r_before


def test_partial_resume_produces_identical_index(setup):
    """Simulate a crash: keep only partition 0's outputs, rebuild, compare."""
    src = f"{BASE}/idx_a"
    crash = f"{BASE}/idx_crash"
    shutil.rmtree(crash, ignore_errors=True)
    os.makedirs(f"{crash}/docdata")
    os.makedirs(f"{crash}/_partials")
    shutil.copy(f"{src}/docdata/part-00000.parquet", f"{crash}/docdata/")
    shutil.copytree(f"{src}/_partials/part-00000",
                    f"{crash}/_partials/part-00000")
    build_index(f"{BASE}/data_a", crash, schema(),
                html_fallback=("text", "html"),
                target_docs_per_partition=300, num_shards=4)
    ra, rc = IndexReader(src), IndexReader(crash)
    for q in QUERIES:
        assert ra.search(q, 20).hits == rc.search(q, 20).hits, q


def test_remap_purges_stale_partials(setup):
    """A crashed attempt can leave marker-less (or older-format) partial
    files behind; the re-map must PURGE them, not mix them with fresh
    output (mixing double-appends postings: doubled df, wrong BM25)."""
    src = f"{BASE}/idx_a"
    crash = f"{BASE}/idx_crash_stale"
    shutil.rmtree(crash, ignore_errors=True)
    os.makedirs(f"{crash}/docdata")
    os.makedirs(f"{crash}/_partials/part-00001")
    # partition 0 finished cleanly; partition 1 "crashed" after writing
    # one shard partial (copied from partition 0 = wrong content, which
    # corrupts the index iff the re-map fails to purge it)
    shutil.copy(f"{src}/docdata/part-00000.parquet", f"{crash}/docdata/")
    shutil.copytree(f"{src}/_partials/part-00000",
                    f"{crash}/_partials/part-00000")
    # the stale leftover is a pre-encoded fragment file; the retry below
    # runs with fragments disabled (simulating a config change between
    # attempts), so nothing overwrites it — only the purge removes it
    stale = glob.glob(f"{src}/_partials/part-00000/shard-*.enc.parquet")
    assert stale, "fixture expects enc fragments in idx_a partials"
    for f in stale:  # every shard, so every hot term doubles if mixed
        shutil.copy(f, f"{crash}/_partials/part-00001/")
    build_index(f"{BASE}/data_a", crash, schema(),
                html_fallback=("text", "html"),
                target_docs_per_partition=300, num_shards=4,
                frag_min_df=10**9)
    ra, rc = IndexReader(src), IndexReader(crash)
    # stale-fragment mixing doubles hot-term stats — check df directly
    for t in ("w0000", "w0042", "w0123", "w0456"):
        assert rc.doc_freq("text", t) == ra.doc_freq("text", t), t
    for q in QUERIES:
        assert ra.search(q, 20).hits == rc.search(q, 20).hits, q


def test_replan_rebuilds_instead_of_stale_skip(setup, ray_session):
    """Resuming an INTERRUPTED build with a CHANGED plan (different
    partition size => new doc_bases/row_groups per pid) must re-map —
    pid-only checkpoint skips would mix doc-id spaces from two
    incompatible plans into one index."""
    idx = f"{BASE}/idx_replan"
    shutil.rmtree(idx, ignore_errors=True)
    build_index(f"{BASE}/data_a", idx, schema(),
                html_fallback=("text", "html"),
                target_docs_per_partition=300, num_shards=4,
                keep_partials=True)
    # simulate a crash BEFORE commit: docdata + marked partials remain,
    # but no manifest/txlog — then resume with half-size partitions
    shutil.rmtree(f"{idx}/txlog")
    os.unlink(f"{idx}/manifest.json")
    res = build_index(f"{BASE}/data_a", idx, schema(),
                      html_fallback=("text", "html"),
                      target_docs_per_partition=150, num_shards=4)
    assert res.resumed_partitions == 0       # every spec mismatched
    assert res.num_partitions == 3           # one per 200-row row group
    ra, rb = IndexReader(f"{BASE}/idx_a"), IndexReader(idx)
    for q in QUERIES:
        assert ra.search(q, 20).hits == rb.search(q, 20).hits, q
    from tantivy4java_ray.state.manifest import TransactionLog
    assert len(TransactionLog(idx).read_state()["partitions"]) == 3


def test_schema_change_rebuilds_not_stale_fastpath(setup, ray_session):
    """A committed same-files build re-requested with a DIFFERENT schema
    must rebuild (the fast path silently returned the stale index)."""
    idx = f"{BASE}/idx_reschema"
    shutil.rmtree(idx, ignore_errors=True)
    s1 = schema()
    build_index(f"{BASE}/data_a", idx, s1, html_fallback=("text", "html"),
                target_docs_per_partition=300, num_shards=4)
    r = IndexReader(idx)
    assert "url" not in {f.name for f in r.schema.fields}
    s2 = schema()
    s2.add_string_field("url")
    res = build_index(f"{BASE}/data_a", idx, s2,
                      html_fallback=("text", "html"),
                      target_docs_per_partition=300, num_shards=4)
    assert res.resumed_partitions == 0
    r2 = IndexReader(idx)
    from tantivy4java_ray.query import Query
    docs, _ = r2.evaluate(Query.term("url",
                                     "https://site0.example/page/0"))
    assert docs.tolist() == [0]
    # identical re-request stays the instant fast path
    res3 = build_index(f"{BASE}/data_a", idx, s2,
                       html_fallback=("text", "html"),
                       target_docs_per_partition=300, num_shards=4)
    assert res3.resumed_partitions == res3.num_partitions


def test_txlog_append_is_put_if_absent(tmp_path):
    """Two writers claiming the same next version must not clobber each
    other: the loser re-claims the next free version."""
    from tantivy4java_ray.state.manifest import TransactionLog
    log = TransactionLog(str(tmp_path / "idx"))
    v0 = log.append([{"set_meta": {"a": 1}}])
    # simulate a concurrent writer that already claimed v1
    import json as _json
    with open(f"{log.dir}/v{v0 + 1:08d}.json", "w") as f:
        _json.dump({"version": v0 + 1, "actions":
                    [{"set_meta": {"other": True}}]}, f)
    v2 = log.append([{"set_meta": {"b": 2}}])
    assert v2 == v0 + 2                      # collision skipped, not lost
    st = log.read_state()
    assert st["meta"] == {"a": 1, "other": True, "b": 2}


def test_txlog_checkpoint_skips_old_version_reads(tmp_path, monkeypatch):
    """read_state must not open version files at or below the latest
    checkpoint (remote logs: one GET per historical version)."""
    from tantivy4java_ray.state import manifest as m
    log = m.TransactionLog(str(tmp_path / "idx"))
    for i in range(5):
        log.append([{"set_meta": {f"k{i}": i}}])
    log.create_checkpoint()
    log.append([{"set_meta": {"tail": 9}}])
    reads = []
    orig = m.TransactionLog._ls

    import tantivy4java_ray.storage as st
    real_read = st.read_json_any
    monkeypatch.setattr(st, "read_json_any",
                        lambda p: (reads.append(p), real_read(p))[1])
    state = log.read_state()
    assert state["meta"]["tail"] == 9 and state["meta"]["k0"] == 0
    version_reads = [p for p in reads if "/v0" in p]
    assert len(version_reads) == 1           # only the post-checkpoint one
    assert orig is m.TransactionLog._ls      # (keep linter quiet)


def test_txlog_lineage(setup):
    from tantivy4java_ray.state.manifest import TransactionLog
    state = TransactionLog(f"{BASE}/idx_a").read_state()
    assert state["committed"]
    assert len(state["partitions"]) == 2
    for p in state["partitions"].values():
        assert "metrics" in p and p["metrics"]["build_s"] >= 0
        assert p["path"].endswith(".parquet")
    state_m = TransactionLog(f"{BASE}/idx_merged").read_state()
    assert state_m["meta"]["plan"]["merged_from"] == [
        f"{BASE}/idx_a", f"{BASE}/idx_b"]


def test_merge_skip_corrupt_truncated_shard(setup):
    """skip_corrupt=True drops a truncated input with a SkippedSplit
    record and completes the merge over the sound inputs (the
    reference's skipped-splits contract, QuickwitSplit.java:140-158)."""
    bad = f"{BASE}/idx_bad"
    shutil.rmtree(bad, ignore_errors=True)
    shutil.copytree(f"{BASE}/idx_b", bad)
    # truncate one shard's postings to half: dictionary offsets now
    # point past EOF
    pbin = glob.glob(f"{bad}/shards/shard-*/postings.bin")[0]
    blob = open(pbin, "rb").read()
    with open(pbin, "wb") as f:
        f.write(blob[: len(blob) // 2])

    out = f"{BASE}/idx_skip"
    shutil.rmtree(out, ignore_errors=True)
    res = merge_indexes([f"{BASE}/idx_a", bad], out, skip_corrupt=True)
    assert res.skipped and res.skipped[0].index_dir == bad
    assert "truncated" in res.skipped[0].reason
    assert res.num_docs == 600  # idx_a alone
    r = IndexReader(out)
    ra = IndexReader(f"{BASE}/idx_a")
    for q in QUERIES:
        assert r.search(q, 20).hits == ra.search(q, 20).hits, q
    # skip record persisted in the output manifest for lineage
    from tantivy4java_ray.state.manifest import TransactionLog
    plan = TransactionLog(out).read_state()["meta"]["plan"]
    assert plan["skipped_inputs"] == [
        {"index_dir": bad, "reason": res.skipped[0].reason}]

    # strict mode (default) must refuse loudly, never byte-copy the
    # truncated blob into the output
    out2 = f"{BASE}/idx_strict"
    shutil.rmtree(out2, ignore_errors=True)
    with pytest.raises(ValueError, match="truncated"):
        merge_indexes([f"{BASE}/idx_a", bad], out2)


def test_merge_skip_corrupt_all_bad_raises(setup):
    bad = f"{BASE}/idx_allbad"
    shutil.rmtree(bad, ignore_errors=True)
    os.makedirs(bad)  # no manifest at all
    with pytest.raises(ValueError, match="every merge input was skipped"):
        merge_indexes([bad], f"{BASE}/idx_never", skip_corrupt=True)


def test_merge_skip_corrupt_clean_inputs_no_skips(setup):
    out = f"{BASE}/idx_skipclean"
    shutil.rmtree(out, ignore_errors=True)
    res = merge_indexes([f"{BASE}/idx_a", f"{BASE}/idx_b"], out,
                        skip_corrupt=True)
    assert res.skipped is None and res.num_docs == 1200
