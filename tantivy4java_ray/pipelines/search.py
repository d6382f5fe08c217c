"""Query execution: shard-local posting reads + vectorized BM25 / block-max
WAND top-k, the Ray retelling of the reference's search path (SURVEY.md §3.2).

An ``IndexReader`` opens the manifest once, then lazily mmaps per-shard term
dictionaries and posting files (the analog of the reference's split hotcache
/ component prewarm, ``split/SplitSearcher.java:64-72``). BM25 uses *global*
``(N, df, avgdl)`` from the build manifest, so every shard scores as if it
were one tantivy ``Searcher`` (the single-index contract the reference's
JUnit scoring tests assert — ``native/src/searcher/jni_searcher.rs:83-88``).

Formula (tantivy defaults, f32 arithmetic)::

    idf    = ln(1 + (N - df + 0.5) / (df + 0.5))
    weight = boost * idf * (k1 + 1)
    score  = weight * tf / (tf + k1 * (1 - b + b * dl / avgdl))

with ``dl`` decoded from the u8 fieldnorm id through a 256-entry cache (one
multiply-add per posting, never a division per doc).

Two traversal strategies:

- ``scan``: decode the whole posting list and score vectorized (numpy) —
  optimal for selective terms and for full-result queries.
- ``wand``: block-max WAND over the skip metadata (``last_doc``/``max_tf``
  per 128-block) for top-k union queries — the 10^12-doc scale path; blocks
  whose max possible score cannot beat the current kth score are skipped
  without decoding.

``batch_search`` wraps the reader in a Ray Data actor-pool stage
(``map_batches(QueryExecutor, concurrency=N)``) for high-QPS query sets.
"""

from __future__ import annotations

import heapq
import json
import os
import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tantivy4java_ray import postings as pcodec
from tantivy4java_ray.fieldnorm import FIELD_NORMS_TABLE
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import FieldType, IndexSchema


@dataclass
class SearchResult:
    """``result/SearchResult.java`` analog: scored hits + optional aggs."""

    hits: list[tuple[float, int]]  # (score, doc_id), score-desc
    aggregations: dict | None = None

    def to_table(self) -> pa.Table:
        return pa.table({
            "score": pa.array([h[0] for h in self.hits], pa.float32()),
            "doc_id": pa.array([h[1] for h in self.hits], pa.int64())})

    def __len__(self) -> int:
        return len(self.hits)


def _leaf(docs: np.ndarray, scores: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return docs, scores


_EMPTY = (np.empty(0, np.int64), np.empty(0, np.float32))


class IndexReader:
    """Opens the manifest once; per-shard dictionaries/postings are lazy.

    ``doc_range=(lo, hi)`` pins the reader to the partitions covering
    that global doc-id window (boundaries must align to partition
    boundaries): fieldnorms / fast columns / docdata load ONLY for the
    owned partitions (resident set O(docs/num_actors)) and posting reads
    skip to the intersecting 128-blocks via the skip array. Global BM25
    stats (N, df, avgdl) still come from the manifest + full dictionary,
    so a range reader scores every owned doc exactly like a full reader —
    the per-split leaf search contract (``async_impl.rs:1007`` leaf
    search + caller merge, ``jni_searcher.rs:83-88`` global stats)."""

    def __init__(self, index_dir: str,
                 doc_range: tuple[int, int] | None = None):
        from tantivy4java_ray import storage as st
        self._st = st
        self.index_dir = index_dir
        mpath = st.sjoin(index_dir, "manifest.json")
        if st.sexists(mpath):
            self.state = st.read_json_any(mpath)
        else:
            if not st.sexists(st.sjoin(index_dir, "txlog")):
                raise FileNotFoundError(
                    f"{index_dir!r} is not an index: no manifest.json or "
                    f"txlog/ found (was it built with build_index?)")
            from tantivy4java_ray.state.manifest import TransactionLog
            self.state = TransactionLog(index_dir).read_state()
        if not self.state.get("meta"):
            raise FileNotFoundError(
                f"{index_dir!r}: txlog present but no committed build")
        meta = self.state["meta"]
        self.schema = IndexSchema.from_dict(meta["schema"])
        self.stats = meta["stats"]
        #: doc-ID space (tantivy ``max_doc``): doc ranges, partitions,
        #: and leaf splits address this space; tombstoned ids stay in it
        self.max_doc: int = self.stats["num_docs"]
        #: ALIVE docs (tantivy ``Searcher::num_docs``): ``max_doc``
        #: minus merge tombstones — adjusted below once
        #: ``deleted_docs.npy`` loads. BM25 idf uses this N (tantivy's
        #: Bm25Weight reads searcher.num_docs()); avgdl keeps the
        #: build-time totals over the full id space, matching tantivy's
        #: pre-compaction fieldnorm accounting.
        self.num_docs: int = self.max_doc
        self.avgdl: dict[str, float] = self.stats["avgdl"]
        cfg = meta["config"]
        self.k1: float = cfg["bm25"]["k1"]
        self.b: float = cfg["bm25"]["b"]
        self.exact_fieldnorms: bool = cfg.get("exact_fieldnorms", False)
        self.hot_salts: int = cfg.get("hot_salts", 0)
        self.features: frozenset = frozenset(cfg.get("index_features", ()))
        #: score dtype: f32 (tantivy parity) or f64 (SQL-oracle parity)
        self.score_dtype = np.float64 if self.exact_fieldnorms else np.float32
        self.num_shards: int = meta["plan"]["num_shards"]
        parts = sorted(self.state["partitions"].values(),
                       key=lambda p: p["doc_base"])
        if doc_range is not None:
            lo, hi = int(doc_range[0]), int(doc_range[1])
            parts = [p for p in parts if p["doc_base"] >= lo
                     and p["doc_base"] + p["num_docs"] <= hi]
            covered = sum(p["num_docs"] for p in parts)
            if covered != hi - lo or (parts and parts[0]["doc_base"] != lo):
                raise ValueError(
                    f"doc_range {doc_range} does not align to partition "
                    f"boundaries (covered {covered} of {hi - lo} docs)")
            self.doc_lo, self.doc_hi = lo, hi
        else:
            self.doc_lo = 0
            self.doc_hi = self.max_doc
        self.doc_range = doc_range
        self.partitions = parts
        self.doc_bases = np.array([p["doc_base"] for p in parts], np.int64)
        # lazy caches (per-process; actor pools get one per actor)
        self._dicts: dict[int, dict] = {}
        self._fslices: dict[tuple[int, str], dict | None] = {}
        self._post_mm: dict[int, np.memmap] = {}
        self._pos_mm: dict[int, np.memmap] = {}
        self._bm_mm: dict[int, object] = {}
        # parsed skip tables + block-max frontiers (tiny, index-immutable)
        self._skip_cache: dict[tuple[int, int], object] = {}
        self._bm_cache: dict[tuple[int, int], tuple | None] = {}
        self._topk_cache: dict[tuple, list] = {}
        #: local-memmap pruning gate: min avg docs per run before the
        #: block-max path beats the batched full decode (measured; see
        #: _pruned_term_search). Remote blobs ignore it.
        self.prune_min_run_docs = 16384
        self._norms: dict[str, np.ndarray] = {}
        self._dls: dict[str, np.ndarray] = {}
        self._fast: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._fast_part: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
        self._norm_cache: dict[str, np.ndarray] = {}
        # decoded-postings LRU (byte-bounded): the hotcache analog for
        # repeated terms in a steady-state query workload; the index is
        # immutable so entries never invalidate
        from collections import OrderedDict
        self._post_cache: "OrderedDict[tuple[str, str], tuple]" = \
            OrderedDict()
        self._post_cache_bytes = 0
        self.postings_cache_max = 128 << 20
        self._pos_cache: "OrderedDict[tuple[str, str], tuple]" = \
            OrderedDict()
        self._pos_cache_bytes = 0
        # const-union (filter bitset) LRU: automaton / term-range /
        # prefix unions are pure functions of the immutable index, so
        # repeated filters cost one dictionary hit (Quickwit caches the
        # same shape per-split)
        self._union_cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        self._shard_memo: dict[tuple[str, str], list[int]] = {}
        self._union_cache_bytes = 0
        self.union_cache_max = 32 << 20
        self._df_cache: dict[tuple[str, str], int] = {}
        # doc-store tier: ParquetFile handles (footer parsed once) and
        # decoded per-(row-group, column) arrays, byte-bounded LRU — the
        # doc-store block cache analog (the reference caches decoded
        # store blocks per split; split/SplitCacheManager.java store
        # component). Index + source parquet are immutable, so entries
        # never invalidate.
        self._pf_cache: dict[str, object] = {}
        self._rg_lens: dict[str, np.ndarray] = {}
        self._doc_cache: "OrderedDict[tuple, pa.Array]" = OrderedDict()
        self._doc_cache_bytes = 0
        self.doc_cache_max = 256 << 20
        # [hits, misses] per cache tier (SplitCacheManager.getCacheStats
        # analog, split/SplitCacheManager.java:983-1005)
        self._cstats = {"postings": [0, 0], "positions": [0, 0],
                        "union": [0, 0], "docstore": [0, 0]}
        dpath = st.sjoin(index_dir, "deleted_docs.npy")
        self.deleted: np.ndarray | None = None
        if st.sexists(dpath):
            with st.sopen(dpath, "rb") as f:
                self.deleted = np.load(f)
            self.num_docs = self.max_doc - int(len(self.deleted))

    # -- shard access -------------------------------------------------------
    def _query_term(self, field: str, term: str) -> str:
        """Mirror the build side's NUL sanitization (build.py:_emit_terms):
        non-TEXT vocab had \\x00 -> U+FFFD applied before hashing/storing
        (pandas siphash truncates at NUL), so exact-match query terms must
        map identically or they hash to the wrong shard key."""
        if "\x00" in term and \
                self.schema.get_field(field).type is not FieldType.TEXT:
            return term.replace("\x00", "\N{REPLACEMENT CHARACTER}")
        return term

    def _candidate_shards(self, field: str, term: str) -> list[int]:
        """Base shard + every hot-salt shard (build.term_shard_salted):
        a hot term's runs may be spread across up to ``hot_salts`` shards.
        \x1f separator: pandas siphash truncates at NUL.

        categorize=False: hash VALUES are identical either way (it is a
        large-array optimization), but the factorize/Categorical setup
        it runs dominates warm single-term query CPU (~70% profiled).
        Memoized per (field, term) — repeat queries skip hashing."""
        hit = self._shard_memo.get((field, term))
        if hit is not None:
            return hit
        keys = [f"{field}\x1f{term}"]
        keys += [f"{field}\x1f{term}\x1f#s{s}"
                 for s in range(self.hot_salts)]
        hs = pd.util.hash_array(np.array(keys, dtype=object),
                                categorize=False)
        out = list(dict.fromkeys(
            int(h % np.uint64(self.num_shards)) for h in hs))
        if len(self._shard_memo) >= 65536:
            self._shard_memo.clear()   # tiny entries; flat reset is fine
        self._shard_memo[(field, term)] = out
        return out

    def _term_runs(self, field: str, term: str) -> list[tuple[int, int]]:
        """-> [(sid, dict_row)] for every run of the term, ascending
        ``run_base`` across all candidate shards (the merge-heap order —
        runs are doc-range-disjoint by construction)."""
        runs: list[tuple[int, int, int]] = []
        term = self._query_term(field, term)
        key = f"{field}\x00{term}"
        for sid in self._candidate_shards(field, term):
            d = self._dict(sid)
            if d is None:
                continue
            lo = np.searchsorted(d["key"], key, side="left")
            hi = np.searchsorted(d["key"], key, side="right")
            for r in range(int(lo), int(hi)):
                runs.append((int(d["run_base"][r]), sid, r))
        runs.sort()
        return [(sid, r) for _, sid, r in runs]

    def _dict(self, sid: int) -> dict | None:
        if sid not in self._dicts:
            path = self._st.sjoin(self.index_dir, "shards",
                                  f"shard-{sid:05d}", "terms.parquet")
            if not self._st.sexists(path):
                self._dicts[sid] = None
            else:
                t = self._st.read_parquet_any(path)
                self._dicts[sid] = {
                    "key": np.asarray(t.column("key").to_numpy(zero_copy_only=False), object),
                    "field": t.column("field").to_numpy(zero_copy_only=False),
                    "term": t.column("term").to_numpy(zero_copy_only=False),
                    "run_base": t.column("run_base").to_numpy(),
                    "df": t.column("df").to_numpy(),
                    "ttf": t.column("ttf").to_numpy(),
                    "offset": t.column("offset").to_numpy(),
                    "nbytes": t.column("nbytes").to_numpy(),
                    "pos_offset": t.column("pos_offset").to_numpy(),
                    "pos_nbytes": t.column("pos_nbytes").to_numpy(),
                }
                nrows = t.num_rows
                if "bm_offset" in t.column_names:
                    self._dicts[sid]["bm_offset"] = \
                        t.column("bm_offset").to_numpy()
                    self._dicts[sid]["bm_nbytes"] = \
                        t.column("bm_nbytes").to_numpy()
                else:  # pre-frontier index: no block-max metadata
                    self._dicts[sid]["bm_offset"] = np.full(nrows, -1,
                                                            np.int64)
                    self._dicts[sid]["bm_nbytes"] = np.zeros(nrows,
                                                             np.int64)
        return self._dicts[sid]

    def _mm(self, sid: int, which: str = "postings"):
        """np.memmap (local) or RangedBlob (URL): both support byte-range
        slicing; posting runs are sliced by (offset, nbytes) before
        decode, so remote reads are one ranged GET per run."""
        cache = {"postings": self._post_mm, "positions": self._pos_mm,
                 "blockmax": self._bm_mm}[which]
        if sid not in cache:
            path = self._st.sjoin(self.index_dir, "shards",
                                  f"shard-{sid:05d}", f"{which}.bin")
            if which == "blockmax" and not self._st.sexists(path):
                cache[sid] = None   # pre-frontier index
            else:
                cache[sid] = self._st.blob_open(path)
        return cache[sid]

    def _run_skip(self, sid: int, r: int):
        """Parsed skip table of one posting run, cached (tiny,
        index-immutable; parsed once per run per reader). Remote blobs
        read ONLY the region head — the pruned path must not page in the
        whole run just to see its skip table."""
        k = (sid, r)
        sk = self._skip_cache.get(k)
        if sk is None:
            mm = self._mm(sid)
            off = int(self._dict(sid)["offset"][r])
            if isinstance(mm, np.ndarray):
                sk = pcodec.read_skip(mm, off)
            else:
                nblocks = int(np.frombuffer(mm[off:off + 8],
                                            np.uint32, 1, 4)[0])
                head = mm[off:off + 8 + nblocks * 10]
                sk = pcodec.read_skip(head, 0)
            self._skip_cache[k] = sk
        return sk

    def _run_frontier(self, sid: int, r: int):
        """One run's parsed block-max frontier -> (pair_offsets int64,
        tf f32, nid u8) or None when the run carries no frontier (cold
        reduce-encoded run, or a pre-frontier index)."""
        k = (sid, r)
        if k in self._bm_cache:
            return self._bm_cache[k]
        d = self._dict(sid)
        nb = int(d["bm_nbytes"][r])
        out = None
        if nb > 0:
            mm = self._mm(sid, "blockmax")
            if mm is not None:
                off = int(d["bm_offset"][r])
                out = pcodec.parse_frontier_blob(mm[off:off + nb])
        self._bm_cache[k] = out
        return out

    def _prefetch_runs(self, runs, which: str = "postings") -> None:
        """Remote blobs: warm the byte-range page cache for all of a
        term's runs in one coalesced batch (request consolidation,
        ``BATCH_OPTIMIZATION_DEVELOPERS_GUIDE.md:900-947``). No-op on
        local memmaps."""
        by_sid: dict[int, list[int]] = {}
        for sid, r in runs:
            by_sid.setdefault(sid, []).append(r)
        okey = "offset" if which == "postings" else "pos_offset"
        nkey = "nbytes" if which == "postings" else "pos_nbytes"
        for sid, rs in by_sid.items():
            mm = self._mm(sid, which)
            if mm is None or not hasattr(mm, "prefetch"):
                continue
            d = self._dict(sid)
            mm.prefetch([(int(d[okey][r]), int(d[okey][r]) + int(d[nkey][r]))
                         for r in rs])

    def _run_bytes(self, sid: int, r: int, which: str = "postings"):
        """One posting/position run's exact byte range: a zero-copy
        memmap view locally, ONE ranged GET on object storage."""
        d = self._dict(sid)
        mm = self._mm(sid, which)
        if which == "postings":
            off, nb = int(d["offset"][r]), int(d["nbytes"][r])
        else:
            off, nb = int(d["pos_offset"][r]), int(d["pos_nbytes"][r])
        return mm[off:off + nb]

    # -- dictionary-level metadata -----------------------------------------
    def doc_freq(self, field: str, term: str) -> int:
        """df(term) — ``core/Searcher.java:221-226``. Cached (tiny
        entries; the index is immutable)."""
        ck = (field, term)
        df = self._df_cache.get(ck)
        if df is None:
            df = sum(int(self._dict(sid)["df"][r])
                     for sid, r in self._term_runs(field, term))
            if len(self._df_cache) < 1_000_000:
                self._df_cache[ck] = df
        return df

    def postings(self, field: str, term: str) -> tuple[np.ndarray, np.ndarray]:
        """-> (global doc ids int64 ascending, tfs uint32).

        Salted hot terms produce runs whose doc RANGES overlap across
        shards (doc *sets* are always disjoint — a doc lives in exactly one
        partition); a final merge-sort restores global order when needed."""
        ck = (field, term)
        hit = self._post_cache.get(ck)
        if hit is not None:
            self._cstats["postings"][0] += 1
            self._post_cache.move_to_end(ck)
            return hit
        self._cstats["postings"][1] += 1
        runs = self._term_runs(field, term)
        if not runs:
            return np.empty(0, np.int64), np.empty(0, np.uint32)
        self._prefetch_runs(runs, "postings")
        doc_parts, tf_parts = [], []
        if self.doc_range is None:
            # full-index path: batch-decode ALL of a shard's runs in one
            # width-grouped pass (per-region decode overhead dominates
            # cold multi-run terms — the at-scale shape is one run per
            # build partition). Remote RangedBlobs can't expose one flat
            # buffer, so they stay on the per-run loop below.
            by_sid: dict[int, list[int]] = {}
            for sid, r in runs:
                by_sid.setdefault(sid, []).append(r)
            for sid, rs in by_sid.items():
                d = self._dict(sid)
                mm = self._mm(sid)
                if isinstance(mm, np.ndarray):
                    docs, tfs = pcodec.decode_postings_multi(
                        mm, [int(d["offset"][r]) for r in rs],
                        [int(d["run_base"][r]) for r in rs])
                    if len(docs):
                        doc_parts.append(docs)
                        tf_parts.append(tfs)
                else:
                    for r in rs:
                        base = int(d["run_base"][r])
                        docs, tfs = pcodec.decode_postings(
                            self._run_bytes(sid, r), 0)
                        if len(docs):
                            doc_parts.append(docs.astype(np.int64) + base)
                            tf_parts.append(tfs)
        else:
            for sid, r in runs:
                d = self._dict(sid)
                base = int(d["run_base"][r])
                if self.doc_hi - base <= 0:
                    continue
                # leaf mode: decode only the 128-blocks inside the range
                docs, tfs = pcodec.decode_postings_range(
                    self._run_bytes(sid, r), 0,
                    max(self.doc_lo - base, 0), self.doc_hi - base)
                if not len(docs):
                    continue
                doc_parts.append(docs.astype(np.int64) + base)
                tf_parts.append(tfs)
        if not doc_parts:
            return np.empty(0, np.int64), np.empty(0, np.uint32)
        docs = np.concatenate(doc_parts)
        tfs = np.concatenate(tf_parts)
        if len(doc_parts) > 1 and np.any(docs[1:] <= docs[:-1]):
            order = np.argsort(docs, kind="stable")
            docs, tfs = docs[order], tfs[order]
        self._post_cache_put(ck, docs, tfs)
        return docs, tfs

    def _postings_many_ranged(self, todo: list[tuple[tuple, list]]) -> None:
        """Leaf-mode batch decode: a doc-range-pinned reader decodes only
        the 128-blocks inside its window, but one call per (term, run)
        dominated the cold sharded batch — here every term's in-window
        blocks across all runs gather-decode in ONE pass per shard."""
        from tantivy4java_ray import storage as st
        if st.is_url(self.index_dir):
            # remote leaves keep the pruned per-term GET shape — building
            # skip metadata here would issue serial ranged GETs only to
            # fall through to postings() re-fetching the same runs
            for ck, _runs in todo:
                self.postings(*ck)
            return
        t_sid, t_dst, t_cnt, t_wd, t_wt, t_prev, t_ti = \
            [], [], [], [], [], [], []
        for ti, (_ck, runs) in enumerate(todo):
            for sid, r in runs:
                d = self._dict(sid)
                base = int(d["run_base"][r])
                if base >= self.doc_hi:
                    continue
                sk = self._run_skip(sid, r)
                lo = max(self.doc_lo - base, 0)
                hi = self.doc_hi - base
                b0 = int(np.searchsorted(sk.last_doc, lo, side="left"))
                b1 = min(int(np.searchsorted(sk.last_doc, hi - 1,
                                             side="left")) + 1,
                         sk.nblocks)
                if b0 >= b1:
                    continue
                nb = b1 - b0
                data0 = int(d["offset"][r]) + sk.data_start
                t_sid.append(np.full(nb, sid, np.int32))
                t_dst.append(data0 + sk.block_offsets[b0:b1])
                cnt = np.full(nb, pcodec.BLOCK, np.int64)
                if b1 == sk.nblocks:
                    cnt[-1] = sk.df - (sk.nblocks - 1) * pcodec.BLOCK
                t_cnt.append(cnt)
                t_wd.append(sk.bits_doc[b0:b1].astype(np.int64))
                t_wt.append(sk.bits_tf[b0:b1].astype(np.int64))
                prevg = np.empty(nb, np.int64)
                prevg[0] = base + (int(sk.last_doc[b0 - 1]) + 1
                                   if b0 else 0)
                if nb > 1:
                    prevg[1:] = (base
                                 + sk.last_doc[b0:b1 - 1].astype(np.int64)
                                 + 1)
                t_prev.append(prevg)
                t_ti.append(np.full(nb, ti, np.int32))
        if not t_sid:
            return
        f_sid = np.concatenate(t_sid)
        f_dst = np.concatenate(t_dst)
        f_cnt = np.concatenate(t_cnt)
        f_wd = np.concatenate(t_wd)
        f_wt = np.concatenate(t_wt)
        f_prev = np.concatenate(t_prev)
        f_ti = np.concatenate(t_ti)
        parts: list[list[tuple[np.ndarray, np.ndarray]]] = [
            [] for _ in todo]
        for sid in np.unique(f_sid):
            m = np.flatnonzero(f_sid == sid)
            mm = self._mm(sid)
            if not isinstance(mm, np.ndarray):
                continue   # remote leaves keep the per-term ranged path
            docs, tfs = pcodec.decode_blocks_gather(
                mm, f_dst[m], f_cnt[m], f_wd[m], f_wt[m], f_prev[m])
            cuts = np.zeros(len(m) + 1, np.int64)
            np.cumsum(f_cnt[m], out=cuts[1:])
            for e, ti in enumerate(f_ti[m]):
                if cuts[e + 1] > cuts[e]:
                    parts[ti].append((docs[cuts[e]:cuts[e + 1]],
                                      tfs[cuts[e]:cuts[e + 1]]))
        done = set()
        for ti, (ck, _runs) in enumerate(todo):
            if not parts[ti]:
                continue
            done.add(ti)
            self._cstats["postings"][1] += 1
            docs = np.concatenate([p[0] for p in parts[ti]])
            tfs = np.concatenate([p[1] for p in parts[ti]])
            keep = (docs >= self.doc_lo) & (docs < self.doc_hi)
            docs, tfs = docs[keep], tfs[keep]
            if len(parts[ti]) > 1 and len(docs) \
                    and np.any(docs[1:] <= docs[:-1]):
                order = np.argsort(docs, kind="stable")
                docs, tfs = docs[order], tfs[order]
            self._post_cache_put(ck, docs, tfs)
        for ti, (ck, _runs) in enumerate(todo):
            if ti not in done and ck not in self._post_cache:
                self.postings(*ck)   # remote shards / empty windows

    def _post_cache_put(self, ck, docs: np.ndarray, tfs: np.ndarray) -> None:
        nbytes = docs.nbytes + tfs.nbytes
        if nbytes < self.postings_cache_max // 4:
            self._post_cache[ck] = (docs, tfs)
            self._post_cache_bytes += nbytes
            while self._post_cache_bytes > self.postings_cache_max:
                _k, (d, t) = self._post_cache.popitem(last=False)
                self._post_cache_bytes -= d.nbytes + t.nbytes

    def postings_many(self, pairs: list[tuple[str, str]]) -> None:
        """Warm the postings LRU for MANY terms in one width-grouped
        decode pass per shard.

        A cold multi-term query (boolean / dismax / term-set) otherwise
        pays the per-(term, shard) decode overhead serially; batching
        ACROSS terms merges all their runs' blocks into one
        ``decode_postings_multi`` call per shard, so same-width blocks of
        different terms share a single unpack kernel call (measured: a
        3-head-term OR's decode 24 ms -> ~9 ms on the 100k bench index).
        Remote (RangedBlob) shards and doc-range-pinned leaves keep their
        existing per-term paths."""
        todo: list[tuple[tuple, list]] = []
        seen: set[tuple] = set()
        # cache-refused size: _post_cache_put drops results >= cap/4, so
        # batching such a term decodes it for nothing (evaluate() would
        # miss and decode again) — leave oversized terms to their single
        # decode in the query path. 16 B/posting (i64 docs + i64 tfs).
        df_cap = self.postings_cache_max // 4 // 16
        for field, term in pairs:
            ck = (field, term)
            if ck in seen or ck in self._post_cache:
                continue  # repeated term in one batch: decode once
            seen.add(ck)
            runs = self._term_runs(field, term)
            if not runs:
                continue
            df = sum(int(self._dict(sid)["df"][r]) for sid, r in runs)
            if self.doc_range is not None and self.max_doc:
                # a leaf decodes only its window's blocks; postings are
                # doc-ordered so the window's share of df is ~uniform
                df = df * (self.doc_hi - self.doc_lo) // self.max_doc
            if df >= df_cap:
                continue
            todo.append((ck, runs))
        if len(todo) < 2:
            for ck, _runs in todo:
                self.postings(*ck)
            return
        if self.doc_range is not None:
            self._postings_many_ranged(todo)
            return
        self._prefetch_runs([rn for _, runs in todo for rn in runs],
                            "postings")
        # group (term, run) regions by shard, remembering which term each
        # region belongs to so the concatenated decode splits back out
        by_sid: dict[int, list[tuple[int, int]]] = {}
        for ti, (_ck, runs) in enumerate(todo):
            for sid, r in runs:
                by_sid.setdefault(sid, []).append((ti, r))
        parts: list[list[tuple[np.ndarray, np.ndarray]]] = [
            [] for _ in todo]
        for sid, regions in by_sid.items():
            d = self._dict(sid)
            mm = self._mm(sid)
            if isinstance(mm, np.ndarray):
                offs = [int(d["offset"][r]) for _ti, r in regions]
                bases = [int(d["run_base"][r]) for _ti, r in regions]
                docs, tfs = pcodec.decode_postings_multi(mm, offs, bases)
                cuts = np.cumsum([int(d["df"][r]) for _ti, r in regions])
                lo = 0
                for (ti, _r), hi in zip(regions, cuts):
                    if hi > lo:
                        parts[ti].append((docs[lo:hi], tfs[lo:hi]))
                    lo = int(hi)
            else:
                for ti, r in regions:
                    base = int(d["run_base"][r])
                    docs, tfs = pcodec.decode_postings(
                        self._run_bytes(sid, r), 0)
                    if len(docs):
                        parts[ti].append((docs.astype(np.int64) + base,
                                          tfs))
        for ti, (ck, _runs) in enumerate(todo):
            self._cstats["postings"][1] += 1
            if not parts[ti]:
                continue
            docs = np.concatenate([p[0] for p in parts[ti]])
            tfs = np.concatenate([p[1] for p in parts[ti]])
            if len(parts[ti]) > 1 and np.any(docs[1:] <= docs[:-1]):
                order = np.argsort(docs, kind="stable")
                docs, tfs = docs[order], tfs[order]
            self._post_cache_put(ck, docs, tfs)

    def positions(self, field: str, term: str
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (docs, tfs, flat positions aligned by cumsum(tfs))."""
        ck = (field, term)
        hit = self._pos_cache.get(ck)
        if hit is not None:
            self._cstats["positions"][0] += 1
            self._pos_cache.move_to_end(ck)
            return hit
        self._cstats["positions"][1] += 1
        runs = self._term_runs(field, term)
        if not runs:
            return (np.empty(0, np.int64), np.empty(0, np.uint32),
                    np.empty(0, np.uint32))
        self._prefetch_runs(runs, "postings")
        self._prefetch_runs(runs, "positions")
        doc_parts, tf_parts, pos_parts = [], [], []
        if self.doc_range is None:
            # full-index path: batch-decode docs/tfs per shard (see
            # postings()); position streams decode per run (one unpack
            # each) and concatenate in the SAME region order, keeping
            # the tf-alignment invariant
            by_sid: dict[int, list[int]] = {}
            for sid, r in runs:
                by_sid.setdefault(sid, []).append(r)
            for sid, rs in by_sid.items():
                d = self._dict(sid)
                mm = self._mm(sid)
                pos_mm = self._mm(sid, "positions")
                if isinstance(mm, np.ndarray):
                    docs, tfs = pcodec.decode_postings_multi(
                        mm, [int(d["offset"][r]) for r in rs],
                        [int(d["run_base"][r]) for r in rs])
                    if len(docs):
                        doc_parts.append(docs)
                        tf_parts.append(tfs)
                    for r in rs:
                        if int(d["pos_offset"][r]) >= 0 and \
                                pos_mm is not None:
                            pos_parts.append(pcodec.decode_positions(
                                self._run_bytes(sid, r, "positions"), 0))
                else:
                    for r in rs:
                        base = int(d["run_base"][r])
                        docs, tfs = pcodec.decode_postings(
                            self._run_bytes(sid, r), 0)
                        if not len(docs):
                            continue
                        doc_parts.append(docs.astype(np.int64) + base)
                        tf_parts.append(tfs)
                        if int(d["pos_offset"][r]) >= 0 and \
                                pos_mm is not None:
                            pos_parts.append(pcodec.decode_positions(
                                self._run_bytes(sid, r, "positions"), 0))
        else:
            for sid, r in runs:
                d = self._dict(sid)
                base = int(d["run_base"][r])
                docs, tfs = pcodec.decode_postings(
                    self._run_bytes(sid, r), 0)
                pos = (pcodec.decode_positions(
                    self._run_bytes(sid, r, "positions"), 0)
                    if int(d["pos_offset"][r]) >= 0
                    and self._mm(sid, "positions") is not None else None)
                # positions are tf-aligned: mask docs, repeat over tfs
                keep = ((docs >= self.doc_lo - base)
                        & (docs < self.doc_hi - base))
                if not keep.all():
                    if pos is not None and len(pos):
                        pos = pos[np.repeat(keep, tfs)]
                    docs, tfs = docs[keep], tfs[keep]
                if not len(docs):
                    continue
                doc_parts.append(docs.astype(np.int64) + base)
                tf_parts.append(tfs)
                if pos is not None:
                    pos_parts.append(pos)
        if not doc_parts:
            return (np.empty(0, np.int64), np.empty(0, np.uint32),
                    np.empty(0, np.uint32))
        pos = (np.concatenate(pos_parts) if pos_parts
               else np.empty(0, np.uint32))
        docs = np.concatenate(doc_parts)
        tfs = np.concatenate(tf_parts)
        if len(doc_parts) > 1 and np.any(docs[1:] <= docs[:-1]):
            # merge-sort salted runs; position chunks follow their doc
            order = np.argsort(docs, kind="stable")
            off = np.concatenate(([0], np.cumsum(tfs, dtype=np.int64)))
            lengths = tfs[order].astype(np.int64)
            starts = off[order]
            if len(pos):
                cum = np.cumsum(lengths)
                within = (np.arange(int(cum[-1]), dtype=np.int64)
                          - np.repeat(cum - lengths, lengths))
                pos = pos[np.repeat(starts, lengths) + within]
            docs, tfs = docs[order], tfs[order]
        nbytes = docs.nbytes + tfs.nbytes + pos.nbytes
        if nbytes < self.postings_cache_max // 4:
            self._pos_cache[ck] = (docs, tfs, pos)
            self._pos_cache_bytes += nbytes
            while self._pos_cache_bytes > self.postings_cache_max:
                _k, v = self._pos_cache.popitem(last=False)
                self._pos_cache_bytes -= sum(x.nbytes for x in v)
        return docs, tfs, pos

    # -- automaton / range term matching (vectorized) -----------------------
    def _field_slice(self, sid: int, field: str) -> dict | None:
        """Cached per-(shard, field) view of the sorted term dictionary:
        unique terms + the contiguous dict-row range of each (a term has
        one row per posting run). The dict key is ``field\\x00term`` and
        sorted, so the field's rows are one contiguous window."""
        ck = (sid, field)
        if ck not in self._fslices:
            d = self._dict(sid)
            if d is None:
                self._fslices[ck] = None
            else:
                lo = int(np.searchsorted(d["key"], f"{field}\x00", "left"))
                hi = int(np.searchsorted(d["key"], f"{field}\x01", "left"))
                if hi <= lo:
                    self._fslices[ck] = None
                else:
                    terms = d["term"][lo:hi]
                    new = np.empty(len(terms), bool)
                    new[0] = True
                    np.not_equal(terms[1:], terms[:-1], out=new[1:])
                    starts = np.flatnonzero(new)
                    counts = np.diff(np.append(starts, len(terms)))
                    uterms = terms[starts]
                    self._fslices[ck] = {
                        "lo": lo, "uterms": uterms,
                        "uterms_pa": pa.array(uterms, pa.string()),
                        "starts": starts.astype(np.int64),
                        "counts": counts.astype(np.int64)}
        return self._fslices[ck]

    def _matched_rows(self, sid: int, fs: dict, uidx: np.ndarray
                      ) -> np.ndarray:
        """Matched unique-term indices -> absolute dict rows (all runs)."""
        starts = fs["starts"][uidx]
        counts = fs["counts"][uidx]
        return (np.repeat(starts + fs["lo"], counts)
                + _ranges_within(counts))

    def match_terms(self, field: str, kind: str, *,
                    lo=None, hi=None, incl_lo=True, incl_hi=True,
                    prefix: str | None = None, pattern: str | None = None,
                    predicate=None) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """Vectorized dictionary matching -> ``[(sid, dict_rows, uidx)]``.

        kinds: ``range`` (searchsorted window — O(log V) compares),
        ``prefix`` (range to the prefix successor), ``regex`` (literal-
        prefix window + Arrow RE2 kernel over the window, Python ``re``
        fallback), ``predicate`` (Python scan — the compat path). The
        reference walks an FST automaton (native/src/query/wildcard.rs);
        here the sorted dictionary IS the automaton's data structure."""
        out = []
        for sid in range(self.num_shards):
            fs = self._field_slice(sid, field)
            if fs is None:
                continue
            ut = fs["uterms"]
            if kind in ("range", "prefix"):
                if kind == "prefix":
                    lo_b, hi_b = prefix, _prefix_successor(prefix)
                    i0 = int(np.searchsorted(ut, lo_b, "left"))
                    i1 = (int(np.searchsorted(ut, hi_b, "left"))
                          if hi_b is not None else len(ut))
                else:
                    i0 = (0 if lo is None else int(np.searchsorted(
                        ut, lo, "left" if incl_lo else "right")))
                    i1 = (len(ut) if hi is None else int(np.searchsorted(
                        ut, hi, "right" if incl_hi else "left")))
                if i1 <= i0:
                    continue
                uidx = np.arange(i0, i1, dtype=np.int64)
            elif kind == "regex":
                lit = _literal_prefix_of_regex(pattern)
                i0, i1 = 0, len(ut)
                if lit:
                    i0 = int(np.searchsorted(ut, lit, "left"))
                    succ = _prefix_successor(lit)
                    if succ is not None:
                        i1 = int(np.searchsorted(ut, succ, "left"))
                if i1 <= i0:
                    continue
                window = fs["uterms_pa"].slice(i0, i1 - i0)
                try:
                    import pyarrow.compute as pc
                    # (?s): tantivy-fst regex has no line semantics, so
                    # '.' must match newline in raw STRING terms
                    m = pc.match_substring_regex(
                        window, f"(?s)^(?:{pattern})$")
                    mask = np.asarray(m.to_numpy(zero_copy_only=False), bool)
                except pa.ArrowInvalid:
                    # RE2 rejects the pattern (backrefs, lookaround):
                    # Python re over the (already windowed) slice
                    cre = re.compile(pattern, re.DOTALL)
                    mask = np.fromiter(
                        (cre.fullmatch(t) is not None for t in ut[i0:i1]),
                        bool, i1 - i0)
                uidx = np.flatnonzero(mask).astype(np.int64) + i0
            else:  # predicate
                mask = np.fromiter((bool(predicate(t)) for t in ut),
                                   bool, len(ut))
                uidx = np.flatnonzero(mask).astype(np.int64)
            if len(uidx):
                out.append((sid, self._matched_rows(sid, fs, uidx), uidx))
        return out

    def _cached_union(self, key: tuple, matched_fn) -> np.ndarray:
        """Byte-bounded LRU over const-score union doc arrays (the
        returned array is shared — callers must not mutate it)."""
        hit = self._union_cache.get(key)
        if hit is not None:
            self._cstats["union"][0] += 1
            self._union_cache.move_to_end(key)
            return hit
        self._cstats["union"][1] += 1
        docs = self._union_docs_for_rows(matched_fn())
        self._union_cache[key] = docs
        # +256: per-entry overhead so empty results (nbytes 0) still
        # count toward the bound and a stream of distinct misses evicts
        self._union_cache_bytes += docs.nbytes + 256
        while self._union_cache_bytes > self.union_cache_max:
            _k, d = self._union_cache.popitem(last=False)
            self._union_cache_bytes -= d.nbytes + 256
        return docs

    def _union_docs_for_rows(self, matched: list[tuple[int, np.ndarray,
                                                       np.ndarray]]
                             ) -> np.ndarray:
        """Union of doc ids over matched dictionary rows (all runs)."""
        parts: list[np.ndarray] = []
        for sid, rows, _u in matched:
            d = self._dict(sid)
            mm = self._mm(sid)
            if self.doc_range is None and isinstance(mm, np.ndarray) \
                    and len(rows) > 1:
                # batch ALL matched runs of this shard into one
                # width-grouped decode (automaton expansions match many
                # dictionary rows; per-run decode overhead dominated the
                # cold regex/fuzzy path) — doc ids only, tf unpack skipped
                docs, _tfs = pcodec.decode_postings_multi(
                    mm, [int(d["offset"][r]) for r in rows],
                    [int(d["run_base"][r]) for r in rows], with_tfs=False)
                if len(docs):
                    parts.append(docs)
                continue
            for r in rows:
                base = int(d["run_base"][r])
                if self.doc_range is not None:
                    lhi = self.doc_hi - base
                    if lhi <= 0:
                        continue
                    docs, _tfs = pcodec.decode_postings_range(
                        self._run_bytes(sid, r), 0,
                        max(self.doc_lo - base, 0), lhi)
                else:
                    # const-score union: doc ids only (skip tf unpack)
                    docs, _tfs = pcodec.decode_postings(
                        self._run_bytes(sid, r), 0, with_tfs=False)
                if len(docs):
                    parts.append(docs.astype(np.int64) + base)
        return self._union_docs(parts)

    def terms_matching(self, field: str, predicate) -> list[str]:
        """All terms of ``field`` satisfying a Python predicate (compat /
        generic path — the hot query kinds go through ``match_terms``)."""
        out: set[str] = set()
        for sid in range(self.num_shards):
            fs = self._field_slice(sid, field)
            if fs is None:
                continue
            ut = fs["uterms"]
            out.update(t for t in ut if predicate(t))
        return sorted(out)

    # -- fieldnorms / fast fields ------------------------------------------
    def _docdata_concat(self, col: str, dtype=None) -> np.ndarray:
        arrs = []
        for p in self.partitions:
            path = self._st.sjoin(self.index_dir, "docdata",
                                  f"part-{p['pid']:05d}.parquet")
            t = self._st.read_parquet_any(path, columns=[col])
            arrs.append(t.column(col).to_numpy(zero_copy_only=False))
        out = np.concatenate(arrs) if arrs else np.empty(0)
        return out.astype(dtype) if dtype is not None else out

    def norms(self, field: str) -> np.ndarray:
        if field not in self._norms:
            self._norms[field] = self._docdata_concat(f"norm__{field}", np.uint8)
        return self._norms[field]

    def exact_dls(self, field: str) -> np.ndarray:
        if field not in self._dls:
            self._dls[field] = self._docdata_concat(f"dl__{field}", np.float64)
        return self._dls[field]

    def fast_column_partition(self, field: str, pid: int
                              ) -> tuple[np.ndarray, np.ndarray]:
        """One partition's fast column -> (values, valid_mask); cached."""
        key = (field, pid)
        if key not in self._fast_part:
            path = self._st.sjoin(self.index_dir, "docdata",
                                  f"part-{pid:05d}.parquet")
            t = self._st.read_parquet_any(path, columns=[field]).column(field)
            t = t.combine_chunks()
            self._fast_part[key] = (
                t.to_numpy(zero_copy_only=False),
                np.asarray(t.is_valid().to_numpy(zero_copy_only=False), bool))
        return self._fast_part[key]

    def fast_column(self, field: str) -> tuple[np.ndarray, np.ndarray]:
        """-> (values, valid_mask) concatenated in doc_id order."""
        if field not in self._fast:
            parts = [self.fast_column_partition(field, p["pid"])
                     for p in self.partitions]
            self._fast[field] = (np.concatenate([v for v, _ in parts]),
                                 np.concatenate([m for _, m in parts]))
        return self._fast[field]

    def partition_stats(self, field: str, part: dict) -> tuple | None:
        st = part.get("col_stats", {}).get(field)
        return tuple(st) if st else None

    # -- BM25 ---------------------------------------------------------------
    def idf(self, df: int) -> float:
        return float(np.log1p((self.num_docs - df + 0.5) / (df + 0.5)))

    def _norm_factor_cache(self, field: str) -> np.ndarray:
        """cache[id] = k1 * (1 - b + b * decode(id) / avgdl), float32."""
        if field not in self._norm_cache:
            avgdl = max(self.avgdl.get(field, 0.0), 1e-9)
            dl = FIELD_NORMS_TABLE.astype(np.float64)
            self._norm_cache[field] = (
                self.k1 * (1.0 - self.b + self.b * dl / avgdl)
            ).astype(np.float32)
        return self._norm_cache[field]

    def _score_term_postings(self, field: str, docs: np.ndarray,
                             tfs: np.ndarray, df: int,
                             boost: float = 1.0) -> np.ndarray:
        weight = np.float32(boost * self.idf(df) * (self.k1 + 1.0))
        fcfg = self.schema.get_field(field)
        if fcfg.type is not FieldType.TEXT or not fcfg.fieldnorms:
            # no norms: tantivy scores with fieldnorm = 1
            denom = np.float32(self.k1 * (1.0 - self.b + self.b))
            return (weight * tfs.astype(np.float32)
                    / (tfs.astype(np.float32) + denom))
        if self.exact_fieldnorms:
            # full float64 (oracle-parity mode; SQL-reproducible formula)
            w64 = boost * self.idf(df) * (self.k1 + 1.0)
            avgdl = max(self.avgdl.get(field, 0.0), 1e-9)
            dl = self.exact_dls(field)[docs - self.doc_lo]
            denom = self.k1 * (1.0 - self.b + self.b * dl / avgdl)
            return (w64 * tfs / (tfs + denom)).astype(np.float64)
        cache = self._norm_factor_cache(field)
        denom = cache[self.norms(field)[docs - self.doc_lo]]
        tff = tfs.astype(np.float32)
        return weight * tff / (tff + denom)

    # -- query evaluation ---------------------------------------------------
    def evaluate(self, query: Query, boost: float = 1.0
                 ) -> tuple[np.ndarray, np.ndarray]:
        """-> (docs int64 ascending, scores float32)."""
        k = query.kind
        p = query.params
        if k == "term":
            field, term = p
            if self.schema.get_field(field).type is FieldType.IP_ADDR:
                term = self._ip_term(term)
            docs, tfs = self.postings(field, term)
            if not len(docs):
                return _EMPTY
            df = self.doc_freq(field, term)
            return _leaf(docs, self._score_term_postings(field, docs, tfs,
                                                         df, boost))
        if k == "term_set":
            field, terms = p
            if self.schema.get_field(field).type is FieldType.IP_ADDR:
                terms = [self._ip_term(t) for t in terms]
            # const-score union (termSet has no per-term scoring)
            docs = self._union_docs([self.postings(field, t)[0]
                                     for t in terms])
            return docs, np.full(len(docs), boost, np.float32)
        if k == "all":
            docs = np.arange(self.doc_lo, self.doc_hi, dtype=np.int64)
            docs = self._drop_deleted(docs)
            return docs, np.full(len(docs), boost, np.float32)
        if k == "none":
            return _EMPTY
        if k == "bool":
            return self._eval_bool(p, boost)
        if k == "dismax":
            return self._eval_dismax(*p, boost=boost)
        if k == "boost":
            sub, factor = p
            return self.evaluate(sub, boost * factor)
        if k == "const":
            sub, score = p
            docs, _ = self.evaluate(sub, 1.0)
            return docs, np.full(len(docs), boost * score, np.float32)
        if k == "phrase":
            return self._eval_phrase(*p, boost=boost)
        if k == "fuzzy":
            return self._eval_fuzzy(*p, boost=boost)
        if k == "range":
            return self._eval_range(*p, boost=boost)
        if k in ("regex", "wildcard"):
            return self._eval_automaton(k, *p, boost=boost)
        if k == "exists":
            return self._eval_exists(p[0], boost)
        if k == "json_range":
            return self._eval_json_range(*p, boost=boost)
        if k == "json_exists":
            field, path, *rest = p
            subpaths = rest[0] if rest else True  # pre-r4 2-tuple wire

            def _match_exists():
                matched = []
                # values at the path (str \x01 + numeric \x02); subpath
                # prefixes only when check_subpaths
                # (Query.java:417-420)
                prefs = [f"{path}\x01", f"{path}\x02"]
                if subpaths:
                    prefs.append(f"{path}.")
                for pref in prefs:
                    matched += self.match_terms(field, "prefix",
                                                prefix=pref)
                return matched

            docs = self._drop_deleted(self._cached_union(
                ("jexists", field, path, bool(subpaths)), _match_exists))
            return docs, np.full(len(docs), boost, np.float32)
        if k == "more_like_this":
            return self.evaluate(self._expand_mlt(*p), boost)
        raise ValueError(f"unknown query kind {k!r}")

    def _union_docs(self, parts: list[np.ndarray]) -> np.ndarray:
        """Sorted union of doc-id arrays (dense seen-mask when the span
        fits; unique-sort fallback)."""
        if not parts:
            return np.empty(0, np.int64)
        span = self.doc_hi - self.doc_lo
        if span <= (1 << 23):
            seen = np.zeros(span, bool)
            for d in parts:
                seen[d - self.doc_lo] = True
            return np.flatnonzero(seen) + self.doc_lo
        return np.unique(np.concatenate(parts))

    def _union_sum(self, parts: list[tuple[np.ndarray, np.ndarray]]
                   ) -> tuple[np.ndarray, np.ndarray]:
        """SHOULD-union with score sum. Dense accumulator over the
        reader's doc span when it fits (the leaf regime — O(span +
        total_df) with vectorized adds); concat+unique otherwise.
        Addition order per doc is part order in both paths, so f32
        results are identical."""
        span = self.doc_hi - self.doc_lo
        if span <= (1 << 23):
            dense = np.zeros(span, self.score_dtype)
            seen = np.zeros(span, bool)
            for d, s in parts:
                loc = d - self.doc_lo
                dense[loc] += s
                seen[loc] = True
            loc = np.flatnonzero(seen)
            return loc + self.doc_lo, dense[loc]
        alldocs = np.concatenate([pp[0] for pp in parts])
        allscores = np.concatenate([pp[1] for pp in parts])
        docs, inv = np.unique(alldocs, return_inverse=True)
        scores = np.zeros(len(docs), self.score_dtype)
        np.add.at(scores, inv, allscores)
        return docs, scores

    def _eval_bool(self, clauses, boost: float):
        musts = [(o, q) for o, q in clauses if o == Occur.MUST]
        shoulds = [(o, q) for o, q in clauses if o == Occur.SHOULD]
        nots = [(o, q) for o, q in clauses if o == Occur.MUST_NOT]
        if musts:
            docs, scores = self.evaluate(musts[0][1], boost)
            for _, q in musts[1:]:
                d2, s2 = self.evaluate(q, boost)
                # both sorted: probe with searchsorted (no re-sort)
                hit, idx = _probe_sorted(d2, docs)
                docs = docs[hit]
                scores = scores[hit] + s2[idx[hit]]
            # shoulds contribute score on docs already matching
            for _, q in shoulds:
                d2, s2 = self.evaluate(q, boost)
                hit, idx = _probe_sorted(d2, docs)
                scores = scores.copy()
                scores[hit] += s2[idx[hit]]
        elif shoulds:
            parts = [self.evaluate(q, boost) for _, q in shoulds]
            parts = [pp for pp in parts if len(pp[0])]
            if not parts:
                return _EMPTY
            docs, scores = self._union_sum(parts)
        else:
            return _EMPTY
        for _, q in nots:
            d2, _s = self.evaluate(q, 1.0)
            if len(d2):
                excl, _ = _probe_sorted(d2, docs)
                docs, scores = docs[~excl], scores[~excl]
        return docs, scores

    def _eval_dismax(self, queries, tie_breaker: float, boost: float):
        parts = [self.evaluate(q, boost) for q in queries]
        parts = [pp for pp in parts if len(pp[0])]
        if not parts:
            return _EMPTY
        span = self.doc_hi - self.doc_lo
        if span <= (1 << 23):
            # max accumulator starts at -inf: a doc whose best clause
            # score is NEGATIVE (negative boost) must keep it, not 0
            mx_d = np.full(span, -np.inf, self.score_dtype)
            sm_d = np.zeros(span, self.score_dtype)
            seen = np.zeros(span, bool)
            for d, s in parts:
                loc = d - self.doc_lo
                mx_d[loc] = np.maximum(mx_d[loc], s)
                sm_d[loc] += s
                seen[loc] = True
            loc = np.flatnonzero(seen)
            docs = loc + self.doc_lo
            mx, sm = mx_d[loc], sm_d[loc]
        else:
            alldocs = np.concatenate([pp[0] for pp in parts])
            allscores = np.concatenate([pp[1] for pp in parts])
            docs, inv = np.unique(alldocs, return_inverse=True)
            mx = np.full(len(docs), -np.inf, self.score_dtype)
            sm = np.zeros(len(docs), self.score_dtype)
            np.maximum.at(mx, inv, allscores)
            np.add.at(sm, inv, allscores)
        return docs, mx + np.float32(tie_breaker) * (sm - mx)

    def _eval_phrase(self, field: str, elems, slop: int, boost: float):
        fcfg = self.schema.get_field(field)
        if fcfg.index_option != "position":
            raise ValueError(
                f"phrase query on field {field!r} requires index_option="
                f"'position' (has {fcfg.index_option!r})")
        offsets = [e[0] for e in elems]
        words = [e[1] for e in elems]
        per_term = [self.positions(field, w) for w in words]
        if any(len(t[0]) == 0 for t in per_term):
            return _EMPTY
        # intersect candidate docs
        cand = per_term[0][0]
        for docs, _, _ in per_term[1:]:
            cand = np.intersect1d(cand, docs, assume_unique=True)
        if not len(cand):
            return _EMPTY
        pos_lookup = []
        for docs, tfs, pos in per_term:
            off = np.concatenate(([0], np.cumsum(tfs, dtype=np.int64)))
            idx = np.searchsorted(docs, cand)
            pos_lookup.append((off, idx, pos))
        if slop == 0:
            ci, tfs = _phrase_slop0_counts(len(cand), pos_lookup, offsets)
            if not len(ci):
                return _EMPTY
            docs = cand[ci].astype(np.int64)
        else:
            # per-doc exact-span check (python over candidates, which
            # are post-intersection; slop>0 is the rare path)
            match_docs: list[int] = []
            match_tfs: list[int] = []
            for ci in range(len(cand)):
                plists = []
                for off, idx, pos in pos_lookup:
                    r = idx[ci]
                    plists.append(pos[off[r]:off[r + 1]].astype(np.int64))
                cnt = _count_phrase_matches(plists, offsets, slop)
                if cnt > 0:
                    match_docs.append(int(cand[ci]))
                    match_tfs.append(cnt)
            if not match_docs:
                return _EMPTY
            docs = np.asarray(match_docs, np.int64)
            tfs = np.asarray(match_tfs, np.uint32)
        # phrase scores like a term whose idf is the sum of element idfs
        # (Bm25Weight::for_terms semantics)
        idf_sum = sum(self.idf(self.doc_freq(field, w)) for w in words)
        if not fcfg.fieldnorms:
            # no norms stored: score with fieldnorm = 1 (term-path parity)
            weight = np.float32(boost * idf_sum * (self.k1 + 1.0))
            denom = np.float32(self.k1 * (1.0 - self.b + self.b))
            tff = tfs.astype(np.float32)
            return docs, weight * tff / (tff + denom)
        if self.exact_fieldnorms:
            # full float64 exact-dl (oracle-parity mode) — the same
            # branch _score_term_postings takes; quantized norms here
            # would break the mode's SQL-reproducible score contract
            w64 = boost * idf_sum * (self.k1 + 1.0)
            avgdl = max(self.avgdl.get(field, 0.0), 1e-9)
            dl = self.exact_dls(field)[docs - self.doc_lo]
            denom = self.k1 * (1.0 - self.b + self.b * dl / avgdl)
            tf64 = tfs.astype(np.float64)
            return docs, (w64 * tf64 / (tf64 + denom)).astype(np.float64)
        weight = np.float32(boost * idf_sum * (self.k1 + 1.0))
        cache = self._norm_factor_cache(field)
        denom = cache[self.norms(field)[docs - self.doc_lo]]
        tff = tfs.astype(np.float32)
        return docs, weight * tff / (tff + denom)

    def _eval_json_range(self, field: str, path: str, lo, hi,
                         ilo: bool, ihi: bool, boost: float):
        """Typed JSON subpath range. Numeric bounds use the \\x02 terms
        (order-preserving f64 encoding written at build) so the compare
        is numeric; string bounds range over the \\x01 string terms
        lexicographically (json_query.rs typed-subpath semantics)."""
        def _is_num(b):
            return isinstance(b, (int, float)) and not isinstance(b, bool)

        if any(isinstance(b, bool) for b in (lo, hi)):
            raise TypeError(
                f"json_range does not support boolean bounds, "
                f"got ({lo!r}, {hi!r}) — use json_term for booleans")
        numeric = any(_is_num(b) for b in (lo, hi))
        if numeric and any(b is not None and not _is_num(b)
                           for b in (lo, hi)):
            raise TypeError(
                f"json_range bounds must both be numeric or both strings, "
                f"got ({lo!r}, {hi!r})")
        if numeric:
            if "json_numeric_terms" not in self.features:
                # unflagged index (built before the capability stamp):
                # the \x02 terms may still exist — only raise when the
                # path has string terms but NO numeric ones, i.e. the
                # index really predates typed numeric subpaths and a
                # silent empty result would be wrong
                has_num = bool(self.match_terms(
                    field, "prefix", prefix=f"{path}\x02"))
                if not has_num and bool(self.match_terms(
                        field, "prefix", prefix=f"{path}\x01")):
                    raise ValueError(
                        "numeric json_range requires typed JSON numeric "
                        "terms; this index predates them — rebuild it")
            pref = f"{path}\x02"
            lo_t = (pref + encode_f64_sortable(float(lo))
                    if lo is not None else pref)
            hi_t = (pref + encode_f64_sortable(float(hi))
                    if hi is not None else _prefix_successor(pref))
        else:
            pref = f"{path}\x01"
            lo_t = pref + lo if lo is not None else pref
            hi_t = pref + hi if hi is not None else _prefix_successor(pref)
        i_lo = ilo if lo is not None else True
        i_hi = ihi if hi is not None else False
        # same const-union LRU as term-range/fuzzy/automaton: a repeated
        # JSON filter must not re-decode every matching posting run
        docs = self._drop_deleted(self._cached_union(
            ("jrange", field, lo_t, hi_t, i_lo, i_hi),
            lambda: self.match_terms(field, "range", lo=lo_t, hi=hi_t,
                                     incl_lo=i_lo, incl_hi=i_hi)))
        return docs, np.full(len(docs), boost, np.float32)

    def _eval_fuzzy(self, field: str, value: str, distance: int,
                    transposition: bool, prefix: bool, boost: float):
        """Vectorized length prefilter over the dictionary, banded DP only
        on surviving candidates. ``prefix=True`` admits any term with a
        PREFIX within the edit budget (FuzzyTermQuery::new_prefix): the
        DP returns min distance over the term's prefixes; exact-prefix
        terms short-circuit before the DP."""
        docs = self._drop_deleted(self._cached_union(
            ("fuzzy", field, value, distance, transposition, prefix),
            lambda: self._match_fuzzy(field, value, distance,
                                      transposition, prefix)))
        return docs, np.full(len(docs), boost, np.float32)

    def _match_fuzzy(self, field: str, value: str, distance: int,
                     transposition: bool, prefix: bool):
        """Dictionary rows within the edit budget (shared by evaluate
        and query-shaped warmup)."""
        import pyarrow.compute as pc
        matched = []
        for sid in range(self.num_shards):
            fs = self._field_slice(sid, field)
            if fs is None:
                continue
            lens = np.asarray(pc.utf8_length(fs["uterms_pa"])
                              .to_numpy(zero_copy_only=False), np.int64)
            if prefix:
                # terms may be arbitrarily longer than the pattern
                cand = np.flatnonzero(lens >= len(value) - distance)
            else:
                cand = np.flatnonzero(
                    np.abs(lens - len(value)) <= distance)
            if not len(cand):
                continue
            keep = np.fromiter(
                ((prefix and t.startswith(value))
                 or _edit_distance(value, t, distance, transposition,
                                   prefix=prefix) <= distance
                 for t in fs["uterms"][cand]), bool, len(cand))
            uidx = cand[keep]
            if len(uidx):
                matched.append((sid, self._matched_rows(sid, fs, uidx),
                                uidx))
        return matched

    def _automaton_spec(self, kind: str, field: str, pattern: str,
                        lenient: bool) -> tuple[str, str] | None:
        """regex/wildcard -> ("prefix", literal) | ("regex", rx) | None
        (lenient + uncompilable). Shared by evaluate and warmup."""
        if kind == "wildcard":
            # lowercase only if the field's tokenizer lowercases
            # (native/src/query/wildcard.rs:8-16)
            fcfg = self.schema.get_field(field)
            from tantivy4java_ray.analyzer import get_analyzer
            if (fcfg.type is FieldType.TEXT
                    and get_analyzer(fcfg.tokenizer).lowercase):
                pattern = pattern.lower()
            lit_prefix = pattern.split("*", 1)[0].split("?", 1)[0]
            if pattern == lit_prefix + "*":
                # pure prefix wildcard: dictionary window, no regex at all
                return ("prefix", lit_prefix)
            # [\s\S] not '.': wildcard matches ANY char incl. newline in
            # raw STRING terms (tantivy-fst has no line semantics)
            regex = "".join(
                "[\\s\\S]*" if c == "*" else "[\\s\\S]" if c == "?"
                else re.escape(c) for c in pattern)
        else:
            regex = pattern
        try:
            re.compile(regex)
        except re.error:
            if lenient:
                return None
            raise
        return ("regex", regex)

    def _eval_automaton(self, kind: str, field: str, pattern: str,
                        lenient: bool, boost: float):
        spec = self._automaton_spec(kind, field, pattern, lenient)
        if spec is None:
            return _EMPTY
        mkind, arg = spec
        if mkind == "prefix":
            docs = self._drop_deleted(self._cached_union(
                ("prefix", field, arg),
                lambda: self.match_terms(field, "prefix", prefix=arg)))
        else:
            docs = self._drop_deleted(self._cached_union(
                ("regex", field, arg),
                lambda: self.match_terms(field, "regex", pattern=arg)))
        return docs, np.full(len(docs), boost, np.float32)

    def _ip_term(self, value: str) -> str:
        """User IP string -> fixed-width u128 hex dictionary term; gated
        on the build capability stamp so pre-u128 indexes fail loudly
        instead of returning text-ordered (wrong) matches."""
        if "ip_u128_terms" not in self.features:
            raise ValueError(
                "IP queries require u128-encoded IP terms; this index "
                "predates them — rebuild it")
        from tantivy4java_ray.functions.scalars import ip_term
        return ip_term(value)

    def _eval_range(self, field: str, lower, upper, incl_lo: bool,
                    incl_hi: bool, boost: float):
        fcfg = self.schema.get_field(field)
        if fcfg.type is FieldType.IP_ADDR:
            # numeric u128 compare via the order-preserving hex terms
            # (ip_expansion.rs / SplitRangeQuery.java:12-78 semantics)
            lower = self._ip_term(lower) if lower is not None else None
            upper = self._ip_term(upper) if upper is not None else None
        if fcfg.type in (FieldType.STRING, FieldType.TEXT, FieldType.FACET,
                         FieldType.IP_ADDR):
            # term-range: one searchsorted window per shard dictionary
            # (tombstone-filtered like every other postings-union path)
            docs = self._drop_deleted(self._cached_union(
                ("trange", field, lower, upper, incl_lo, incl_hi),
                lambda: self.match_terms(field, "range", lo=lower, hi=upper,
                                         incl_lo=incl_lo, incl_hi=incl_hi)))
            return docs, np.full(len(docs), boost, np.float32)
        is_date = fcfg.type is FieldType.DATE
        if is_date:
            lower = _to_us(lower) if lower is not None else None
            upper = _to_us(upper) if upper is not None else None
        else:
            lower = float(lower) if lower is not None else None
            upper = float(upper) if upper is not None else None

        doc_parts: list[np.ndarray] = []
        for part in self.partitions:
            # query-time predicate pruning by per-partition min/max stats
            # (the reference prunes splits the same way, async_impl.rs:16-46)
            st = self.partition_stats(field, part)
            if st is not None and st[0] is None:
                # all-null partition (stats exist but carry no bounds):
                # nothing here can match a range — skip it entirely
                continue
            if st is not None:
                lo_s, hi_s = ((_to_us(st[0]), _to_us(st[1])) if is_date
                              else (float(st[0]), float(st[1])))
                if lower is not None and (hi_s < lower
                                          or (hi_s == lower and not incl_lo)):
                    continue
                if upper is not None and (lo_s > upper
                                          or (lo_s == upper and not incl_hi)):
                    continue
            vals, valid = self.fast_column_partition(field, part["pid"])
            if is_date:
                vals = np.asarray(vals, "datetime64[us]").astype(np.int64)
            else:
                vals = np.asarray(vals, np.float64)
            mask = valid.copy()
            if lower is not None:
                mask &= (vals >= lower) if incl_lo else (vals > lower)
            if upper is not None:
                mask &= (vals <= upper) if incl_hi else (vals < upper)
            doc_parts.append(np.flatnonzero(mask).astype(np.int64)
                             + part["doc_base"])
        docs = (np.concatenate(doc_parts) if doc_parts
                else np.empty(0, np.int64))
        docs = self._drop_deleted(docs)
        return docs, np.full(len(docs), boost, np.float32)

    def _drop_deleted(self, docs: np.ndarray) -> np.ndarray:
        """Merge-time delete tombstones apply to fast-field matches
        (postings were already rewritten by the merge)."""
        if self.deleted is None or not len(docs):
            return docs
        dead, _ = _probe_sorted(self.deleted, docs)
        return docs[~dead]

    def _eval_exists(self, field: str, boost: float):
        fcfg = self.schema.get_field(field)
        if not fcfg.fast:
            raise ValueError(f"exists({field}) requires a fast field")
        _, valid = self.fast_column(field)
        docs = self._drop_deleted(np.flatnonzero(valid).astype(np.int64)
                                  + self.doc_lo)
        return docs, np.full(len(docs), boost, np.float32)

    def _expand_mlt(self, doc_fields, max_terms: int, min_tf: int,
                    min_df: int, max_df: int | None = None,
                    min_wlen: int = 0, max_wlen: int | None = None,
                    boost_factor: float = 1.0,
                    stop_words: tuple = ()) -> Query:
        from tantivy4java_ray.analyzer import get_analyzer
        stops = set(stop_words)
        scored: list[tuple[float, str, str]] = []
        for field, text in doc_fields:
            fcfg = self.schema.get_field(field)
            if fcfg.type is not FieldType.TEXT:
                continue
            toks = get_analyzer(fcfg.tokenizer).tokenize(text)
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            for t, c in tf.items():
                if c < min_tf or t in stops:
                    continue
                # tantivy's MoreLikeThis length filters measure &str
                # BYTES, not chars (morelikethis.rs word.len())
                blen = len(t.encode("utf-8"))
                if blen < min_wlen or (max_wlen is not None
                                       and blen > max_wlen):
                    continue
                df = self.doc_freq(field, t)
                if df < min_df or (max_df is not None and df > max_df):
                    continue
                scored.append((c * self.idf(df), field, t))
        scored.sort(reverse=True)
        clauses = [(Occur.SHOULD, Query.term(f, t))
                   for _, f, t in scored[:max_terms]]
        if not clauses:
            return Query.match_none()
        q = Query.boolean(clauses)
        # SHOULD-sum is linear, so one whole-query boost equals per-term
        # boosts (the reference applies boostFactor per expanded term)
        return q if boost_factor == 1.0 else Query.boost(q, boost_factor)

    # -- top-k --------------------------------------------------------------
    def search(self, query: Query | str, limit: int = 10,
               method: str = "auto", offset: int = 0,
               order_by_field: str | None = None,
               descending: bool = True) -> SearchResult:
        """Top-k by BM25, or by a FAST FIELD when ``order_by_field`` is
        given (the reference's Java surface accepts count/orderByField/
        offset/order, ``core/Searcher.java:59-66``, though its native
        impl ignores them — here it is implemented: hits carry the field
        value as the score; docs with a null field are excluded)."""
        if isinstance(query, str):
            from tantivy4java_ray.query import parse_query
            query = parse_query(query, self.schema)
        if order_by_field is not None:
            docs, _scores = self.evaluate(query)
            vals, valid = self.fast_column(order_by_field)
            local = docs - self.doc_lo
            ok = valid[local]
            docs = docs[ok]
            raw = np.asarray(vals)[local[ok]]
            # sort on the NATIVE dtype — casting i64/datetime to f64
            # collides distinct values above 2^53 (snowflake ids, ns
            # timestamps) and would order them by doc id instead
            if np.issubdtype(raw.dtype, np.datetime64):
                key = np.asarray(raw, "datetime64[us]").astype(np.int64)
            elif np.issubdtype(raw.dtype, np.integer):
                key = raw
            else:
                key = np.asarray(raw, np.float64)
            if descending:
                # ~x is order-reversing and overflow-free for both
                # signed and unsigned ints (unlike -x at int64.min)
                skey = ~key if np.issubdtype(key.dtype, np.integer) else -key
            else:
                skey = key
            order = np.lexsort((docs, skey))
            sel = order[offset:offset + limit]
            return SearchResult([(float(key[i]), int(docs[i])) for i in sel])
        # method="auto" always takes the vectorized scan: in this
        # pure-Python runtime numpy full-decode scoring beats the
        # doc-at-a-time WAND loop at every tested scale (WAND is the
        # compiled-kernel / >>10^9-posting path; kept bit-identical and
        # selectable via method="wand")
        # WAND scores the quantized-f32 path; exact-fieldnorm (f64
        # oracle-parity) indexes must keep the scan for score identity
        if method == "wand" and not self.exact_fieldnorms \
                and _wand_eligible(query, self.schema):
            hits = self._wand_search(query, limit + offset)
        else:
            hits = None
            shape = _term_shape(query)
            k = limit + offset
            ckey = None
            if method == "auto" and shape is not None and 1 <= k <= 1024:
                ckey = (shape[0], shape[1], float(shape[2]), k)
                hits = self._topk_cache.get(ckey)
                if hits is None:
                    hits = self._pruned_term_search(*shape, k)
            if hits is None:
                leaves: list[tuple[str, str]] = []
                _collect_postings_leaves(query, self, leaves)
                if len(leaves) > 1:
                    self.postings_many(leaves)
                docs, scores = self.evaluate(query)
                hits = _top_k(docs, scores, limit + offset)
            if ckey is not None:
                # tiny (score, doc) lists; the index is immutable, so a
                # repeated term top-k is a dict hit on either path
                if len(self._topk_cache) >= 65536:
                    self._topk_cache.clear()
                self._topk_cache[ckey] = hits
        return SearchResult(hits[offset:])

    def _pruned_term_search(self, field: str, term: str, boost: float,
                            k: int) -> list[tuple[float, int]] | None:
        """Top-k for a single scored term by block-max pruning: decode
        ONLY the 128-doc blocks whose frontier bound can reach the k-th
        best score (measured 1-3% of blocks for Zipf-head terms).

        Bit-identical to the full scan: frontier pairs dominate every doc
        in their block in (tf up, fieldnorm down), the f32 score
        expression is weakly monotone in both, and the phase-1 theta is
        the k-th best of a SUBSET (<= the true k-th), so every doc that
        can appear in the final top-k — including ties broken by doc id —
        lives in a decoded block. Returns None when ineligible (caller
        falls back to the scan): non-TEXT/no-norms fields, exact-f64
        scoring, non-positive boost, small df, or an already-cached
        posting list.

        At scale this is also the remote read shape: object-store runs
        page in only the skip head, the frontier sidecar, and the
        surviving blocks — bytes per query proportional to k, not df
        (the reference's hotcache + block-max traversal economics,
        ``docs/SPLIT_FILE_FORMAT.md`` + tantivy block WAND)."""
        fcfg = self.schema.get_field(field)
        if (fcfg.type is not FieldType.TEXT or not fcfg.fieldnorms
                or self.exact_fieldnorms or k < 1 or boost <= 0.0
                or (field, term) in self._post_cache):
            return None
        runs = self._term_runs(field, term)
        if not runs:
            return []
        df = self.doc_freq(field, term)
        if df <= max(4 * k, 512):
            return None   # small term: the full decode is already cheap
        # local memmaps: pruning pays only when runs are large — per-run
        # fixed cost (skip + frontier + block metadata) vs decode saved.
        # Interleaved A/B on this host: 32-block runs 0.93x (loss),
        # single 765-block runs 1.13x (win); at the 100k-docs/partition
        # at-scale default every head-term run clears this easily. Remote
        # blobs always prune: bytes paged in scale with k, not df.
        if isinstance(self._mm(runs[0][0]), np.ndarray) \
                and df < self.prune_min_run_docs * len(runs):
            return None
        weight = np.float32(boost * self.idf(df) * (self.k1 + 1.0))
        cache = self._norm_factor_cache(field)

        # flat per-block metadata across ALL runs (decode is then one
        # width-grouped gather per SHARD, not one call per run — at k=10
        # pruning leaves ~a block per run, where per-run call overhead
        # would exceed the decode itself)
        f_sid_l, f_dst_l, f_cnt_l, f_wd_l, f_wt_l, f_prev_l = \
            [], [], [], [], [], []
        fr_tf_l, fr_nid_l, fr_cnt_l, fr_pos_l = [], [], [], []
        flat_pos = 0
        for sid, r in runs:
            d = self._dict(sid)
            base = int(d["run_base"][r])
            if self.doc_range is not None and base >= self.doc_hi:
                continue
            sk = self._run_skip(sid, r)
            b0, b1 = 0, sk.nblocks
            if self.doc_range is not None:
                lo = max(self.doc_lo - base, 0)
                hi = self.doc_hi - base
                b0 = int(np.searchsorted(sk.last_doc, lo, side="left"))
                b1 = min(int(np.searchsorted(sk.last_doc, hi - 1,
                                             side="left")) + 1, sk.nblocks)
                if b0 >= b1:
                    continue
            nb = b1 - b0
            data0 = int(d["offset"][r]) + sk.data_start
            f_sid_l.append(np.full(nb, sid, np.int32))
            f_dst_l.append(data0 + sk.block_offsets[b0:b1])
            cnt = np.full(nb, pcodec.BLOCK, np.int64)
            if b1 == sk.nblocks:
                cnt[-1] = sk.df - (sk.nblocks - 1) * pcodec.BLOCK
            f_cnt_l.append(cnt)
            f_wd_l.append(sk.bits_doc[b0:b1].astype(np.int64))
            f_wt_l.append(sk.bits_tf[b0:b1].astype(np.int64))
            prevg = np.empty(nb, np.int64)
            prevg[0] = base + (int(sk.last_doc[b0 - 1]) + 1 if b0 else 0)
            if nb > 1:
                prevg[1:] = base + sk.last_doc[b0:b1 - 1].astype(np.int64) + 1
            f_prev_l.append(prevg)
            fr = self._run_frontier(sid, r)
            if fr is not None:
                off, ftf, fnid = fr
                fr_tf_l.append(ftf[off[b0]:off[b1]])
                fr_nid_l.append(fnid[off[b0]:off[b1]])
                fr_cnt_l.append(np.diff(off[b0:b1 + 1]))
                fr_pos_l.append(flat_pos + np.arange(nb, dtype=np.int64))
            # no frontier (cold run / pre-frontier index): bound stays
            # +inf — never pruned, always decoded
            flat_pos += nb
        if flat_pos == 0:
            return []
        total_blocks = flat_pos
        bounds = np.full(total_blocks, np.inf, np.float32)
        if fr_tf_l:
            ftf = np.concatenate(fr_tf_l)
            fnid = np.concatenate(fr_nid_l)
            fcnt = np.concatenate(fr_cnt_l)
            fpos = np.concatenate(fr_pos_l)
            # the exact f32 score expression of the scan path, so a bound
            # is the achieved score of a real dominating pair
            s = (weight * ftf) / (ftf + cache[fnid])
            po = np.zeros(len(fcnt) + 1, np.int64)
            np.cumsum(fcnt, out=po[1:])
            bounds[fpos] = np.maximum.reduceat(s, po[:-1])
        f_sid = np.concatenate(f_sid_l)
        f_dst = np.concatenate(f_dst_l)
        f_cnt = np.concatenate(f_cnt_l)
        f_wd = np.concatenate(f_wd_l)
        f_wt = np.concatenate(f_wt_l)
        f_prev = np.concatenate(f_prev_l)

        order = np.argsort(-bounds, kind="stable")
        doc_parts: list[np.ndarray] = []
        tf_parts: list[np.ndarray] = []

        def _decode(sel: np.ndarray) -> None:
            for sid in np.unique(f_sid[sel]):
                m = sel[f_sid[sel] == sid]
                mm = self._mm(sid)
                if isinstance(mm, np.ndarray):
                    dd, tt = pcodec.decode_blocks_gather(
                        mm, f_dst[m], f_cnt[m], f_wd[m], f_wt[m],
                        f_prev[m])
                else:
                    # remote: fetch ONLY the surviving blocks' byte spans
                    # (coalesced) and decode them packed — bytes touched
                    # scale with k, not df
                    sizes = ((f_cnt[m] * f_wd[m] + 7) // 8
                             + (f_cnt[m] * f_wt[m] + 7) // 8)
                    spans = [(int(a), int(a + z))
                             for a, z in zip(f_dst[m], sizes)]
                    if hasattr(mm, "prefetch"):
                        mm.prefetch(spans)
                    parts = [np.asarray(mm[s:e]) for s, e in spans]
                    starts = np.cumsum(sizes) - sizes
                    buf = (np.concatenate(parts) if parts
                           else np.empty(0, np.uint8))
                    dd, tt = pcodec.decode_blocks_gather(
                        buf, starts, f_cnt[m], f_wd[m], f_wt[m],
                        f_prev[m])
                if self.doc_range is not None:
                    keep = (dd >= self.doc_lo) & (dd < self.doc_hi)
                    dd, tt = dd[keep], tt[keep]
                if len(dd):
                    doc_parts.append(dd)
                    tf_parts.append(tt)

        # phase 1: the top k+2 blocks by bound. Bounds are EXACT block
        # maxima (each is an actual doc's score), so these blocks alone
        # contribute k+2 docs whose scores are the k+2 highest bounds —
        # theta lands within a hair of the true k-th score and phase 2
        # keeps only the handful of blocks that can still beat it.
        n1 = min(max(k + 2, 4), total_blocks)
        _decode(order[:n1])
        ndocs = sum(len(p) for p in doc_parts)
        while ndocs < k and n1 < total_blocks:
            n2 = min(total_blocks, max(n1 * 2, n1 + 8))
            _decode(order[n1:n2])
            n1 = n2
            ndocs = sum(len(p) for p in doc_parts)
        if not doc_parts:
            return []
        docs = np.concatenate(doc_parts)
        tfs = np.concatenate(tf_parts)
        scores = self._score_term_postings(field, docs, tfs, df, boost)
        # phase 2: theta = k-th best of the decoded subset (<= the true
        # k-th), keep every remaining block whose bound can still reach it
        if len(scores) >= k:
            theta = np.partition(scores, len(scores) - k)[len(scores) - k]
            rest = order[n1:]
            sel2 = rest[bounds[rest] >= theta]
        else:
            sel2 = order[n1:]
        if len(sel2):
            _decode(sel2)
            docs = np.concatenate(doc_parts)
            tfs = np.concatenate(tf_parts)
            scores = self._score_term_postings(field, docs, tfs, df, boost)
        st = self._cstats.setdefault("blockmax", [0, 0])
        st[0] += total_blocks - (n1 + len(sel2))   # blocks pruned
        st[1] += total_blocks
        return _top_k(docs, scores, k)

    def _wand_search(self, query: Query, k: int) -> list[tuple[float, int]]:
        terms = [(f, t, b) for f, t, b in _collect_union_terms(query)]
        cursors = []
        for field, term, boost in terms:
            for cur in _TermCursor.open_runs(self, field, term, boost):
                cur.ord = len(cursors)
                cursors.append(cur)
        if not cursors:
            return []
        return block_max_wand(cursors, k, self)

    def explain(self, query: Query, doc_id: int) -> dict:
        """Recursive score breakdown for one doc (``Query.java:459-465``;
        Lucene-style explanation tree: every sub-query node reports its
        own contribution at the doc, with BM25 inputs on term leaves)."""
        docs, scores = self.evaluate(query)
        i = np.searchsorted(docs, doc_id)
        in_set = bool(i < len(docs) and docs[i] == doc_id)
        score = float(scores[i]) if in_set else 0.0
        # matched = membership in the result set, NOT bool(score):
        # const(q, 0.0) / boost-0 queries match with score exactly 0.0
        out = {"doc_id": doc_id, "score": score, "matched": in_set,
               "kind": query.kind}
        if query.kind == "term":
            field, term = query.params
            if self.schema.get_field(field).type is FieldType.IP_ADDR:
                # same dictionary-term encoding evaluate() uses; the raw
                # IP string would report df=0/tf=0 beside matched=True
                term = self._ip_term(term)
            df = self.doc_freq(field, term)
            d, tfs = self.postings(field, term)
            j = np.searchsorted(d, doc_id)
            tf = int(tfs[j]) if j < len(d) and d[j] == doc_id else 0
            out.update({"field": field, "term": term, "df": df, "tf": tf,
                        "idf": self.idf(df), "k1": self.k1, "b": self.b,
                        "num_docs": self.num_docs,
                        "avgdl": self.avgdl.get(field)})
        elif query.kind == "bool":
            out["clauses"] = [
                {"occur": occur.name if hasattr(occur, "name") else
                 str(occur), **self.explain(sub, doc_id)}
                for occur, sub in query.params]
        elif query.kind == "dismax":
            subs, tie = query.params
            out["tie_breaker"] = tie
            out["clauses"] = [self.explain(sub, doc_id) for sub in subs]
        elif query.kind == "boost":
            sub, factor = query.params
            out["boost"] = factor
            out["clauses"] = [self.explain(sub, doc_id)]
        elif query.kind == "phrase":
            field, elems, slop = query.params
            words = [w for _o, w in elems]
            dfs = {w: self.doc_freq(field, w) for w in words}
            out.update({"field": field, "slop": slop, "terms": words,
                        "dfs": dfs,
                        "idf_sum": float(sum(self.idf(d)
                                             for d in dfs.values())),
                        "k1": self.k1, "b": self.b,
                        "avgdl": self.avgdl.get(field)})
        elif query.kind == "fuzzy":
            field, term, dist, transpose, prefix = query.params
            expanded: set = set()
            for sid in range(self.num_shards):
                fs = self._field_slice(sid, field)
                if fs is None:
                    continue
                for t in fs["uterms"]:
                    if ((prefix and t.startswith(term))
                            or _edit_distance(term, t, dist, transpose)
                            <= dist):
                        expanded.add(t)
            out.update({"field": field, "term": term, "distance": dist,
                        "expanded_terms": sorted(expanded)})
        elif query.kind in ("regex", "wildcard"):
            field = query.params[0]
            out.update({"field": field, "pattern": query.params[1],
                        "const_score": True})
        elif query.kind == "range":
            field, lo, hi, ilo, ihi = query.params
            out.update({"field": field, "lower": lo, "upper": hi,
                        "include_lower": ilo, "include_upper": ihi,
                        "const_score": True})
        elif query.kind == "const":
            sub, cscore = query.params
            out["const_score"] = cscore
            out["clauses"] = [self.explain(sub, doc_id)]
        elif query.kind == "term_set":
            field, terms = query.params
            out.update({"field": field,
                        "matched_terms": [
                            t for t in terms
                            if (lambda d: len(d[0]) and
                                doc_id in d[0])(self.postings(field, t))],
                        "const_score": True})
        return out

    # -- doc retrieval (hits -> source parquet rows; companion-mode join) ---
    def _pf(self, path: str):
        """ParquetFile with the footer parsed exactly once per reader —
        repeated retrievals were paying a metadata re-parse per call."""
        pf = self._pf_cache.get(path)
        if pf is None:
            pf = self._pf_cache[path] = self._st.parquet_file_any(path)
        return pf

    def _docstore_read(self, path: str, rg_list: list[int] | None,
                       local: np.ndarray, columns: list[str]) -> pa.Table:
        """Read rows at positions ``local`` (relative to the
        concatenation of ``rg_list``'s row groups; ``None`` = whole
        file) returning them in that order. Only row groups containing
        a requested row are decoded, contiguous missing groups coalesce
        into one read, and decoded (row-group, column) arrays live in a
        byte-bounded LRU — so a steady-state retrieval workload decodes
        each store block once (doc-store block cache semantics,
        ``split/SplitCacheManager.java`` store component)."""
        pf = self._pf(path)
        lens = self._rg_lens.get(path)
        if lens is None:
            md = pf.metadata
            lens = np.array([md.row_group(i).num_rows
                             for i in range(md.num_row_groups)], np.int64)
            self._rg_lens[path] = lens
        sel = (np.arange(len(lens), dtype=np.int64) if rg_list is None
               else np.asarray(rg_list, np.int64))
        starts = np.zeros(len(sel) + 1, np.int64)
        np.cumsum(lens[sel], out=starts[1:])
        j = np.searchsorted(starts, local, side="right") - 1
        need = np.unique(j)
        st_ = self._cstats["docstore"]
        # coalesce contiguous missing row groups into single reads
        miss = [int(nj) for nj in need
                if any((path, int(sel[nj]), c) not in self._doc_cache
                       for c in columns)]
        st_[0] += len(need) - len(miss)
        st_[1] += len(miss)
        runs: list[list[int]] = []
        for nj in miss:
            if runs and sel[nj] == sel[runs[-1][-1]] + 1:
                runs[-1].append(nj)
            else:
                runs.append([nj])
        for run in runs:
            rgs = [int(sel[nj]) for nj in run]
            t = pf.read_row_groups(rgs, columns=columns, use_threads=False)
            off = 0
            for rg in rgs:
                n = int(lens[rg])
                piece = t.slice(off, n)
                off += n
                for c in columns:
                    key = (path, rg, c)
                    old = self._doc_cache.pop(key, None)
                    if old is not None:
                        self._doc_cache_bytes -= old.nbytes
                    arr = piece.column(c).combine_chunks()
                    self._doc_cache[key] = arr
                    self._doc_cache_bytes += arr.nbytes
            while (self._doc_cache_bytes > self.doc_cache_max
                   and self._doc_cache):
                _k, a = self._doc_cache.popitem(last=False)
                self._doc_cache_bytes -= a.nbytes
        # assemble the needed row groups in order, then gather rows
        cols_out: dict[str, list] = {c: [] for c in columns}
        new_start = np.empty(len(starts) - 1, np.int64)
        pos = 0
        for nj in need:
            rg = int(sel[nj])
            for c in columns:
                key = (path, rg, c)
                arr = self._doc_cache.get(key)
                if arr is None:  # evicted mid-call: cache smaller than call
                    arr = pf.read_row_groups(
                        [rg], columns=[c],
                        use_threads=False).column(c).combine_chunks()
                else:
                    self._doc_cache.move_to_end(key)
                cols_out[c].append(arr)
            new_start[nj] = pos
            pos += int(lens[rg])
        tbl = pa.table({c: pa.chunked_array(cols_out[c])
                        for c in columns})
        remap = new_start[j] + (local - starts[j])
        return tbl.take(pa.array(remap))

    def retrieve_docs(self, doc_ids, columns: list[str] | None = None,
                      from_store: bool = False) -> pa.Table:
        """Join hits back to the source parquet by positional key —
        ``(__pq_file_hash, __pq_row_in_file)`` analog, no shuffle
        (``parquet_companion/doc_retrieval.rs`` semantics).

        ``from_store=True`` reads fields marked ``stored`` from the
        index's own docdata instead (the STORE component) — retrieval
        without the source parquet.

        Tombstoned ids yield no row (reference parity: deletes apply at
        merge, and a merged-away doc's address no longer exists —
        searches never return these ids, so this only affects direct
        id lookups)."""
        doc_ids = np.asarray(doc_ids, np.int64)
        if self.deleted is not None and len(doc_ids):
            dead, _ = _probe_sorted(self.deleted, doc_ids)
            doc_ids = doc_ids[~dead]
        order = np.argsort(doc_ids, kind="stable")
        sorted_ids = doc_ids[order]
        pidx = np.searchsorted(self.doc_bases, sorted_ids, side="right") - 1
        if from_store and columns is None:
            columns = [f.name for f in self.schema.fields if f.stored]
        if columns is None and self.partitions:
            # source-parquet path, all columns (the pre-cache default)
            columns = self._pf(self.partitions[0]["path"]).schema_arrow.names
        if not columns:  # no stored fields: id-only result, no reads
            return pa.table({"doc_id": pa.array(doc_ids, pa.int64())})
        pieces: list[pa.Table] = []
        out_rows: list[np.ndarray] = []
        for pi in np.unique(pidx):
            part = self.partitions[pi]
            sel = pidx == pi
            local = sorted_ids[sel] - part["doc_base"]
            if from_store:
                path = self._st.sjoin(self.index_dir, "docdata",
                                      f"part-{part['pid']:05d}.parquet")
                tbl = self._docstore_read(
                    path, None, local, [f"stored__{c}" for c in columns])
                tbl = tbl.rename_columns(columns)
            else:
                tbl = self._docstore_read(part["path"], part["row_groups"],
                                          local, columns)
            pieces.append(tbl)
            out_rows.append(np.flatnonzero(sel))
        if not pieces:
            # zero surviving ids (e.g. every requested id tombstoned):
            # keep the SHAPE consistent with the non-empty path — the
            # requested columns, typed from the source schema, plus the
            # id column — not a column-less table
            if not self.partitions:
                # no partition file to read types from — derive them
                # from the index schema so the shape matches what a
                # non-empty index would return for the same `columns`
                _ft_arrow = {
                    FieldType.TEXT: pa.string(),
                    FieldType.STRING: pa.string(),
                    FieldType.FACET: pa.string(),
                    FieldType.JSON: pa.string(),
                    FieldType.IP_ADDR: pa.string(),
                    FieldType.INTEGER: pa.int64(),
                    FieldType.UNSIGNED: pa.uint64(),
                    FieldType.FLOAT: pa.float64(),
                    FieldType.BOOLEAN: pa.bool_(),
                    FieldType.DATE: pa.timestamp("us"),
                    FieldType.BYTES: pa.binary(),
                }
                want = (columns if columns is not None
                        else [f.name for f in self.schema.fields])
                cols = {c: pa.array([], _ft_arrow[
                            self.schema.get_field(c).type])
                        for c in want}
                idname = "__doc_id" if "doc_id" in cols else "doc_id"
                cols[idname] = pa.array([], pa.int64())
                return pa.table(cols)
            if from_store:
                src = self._pf(self._st.sjoin(
                    self.index_dir, "docdata",
                    f"part-{self.partitions[0]['pid']:05d}.parquet")
                ).schema_arrow
                cols = {c: pa.array([], src.field(f"stored__{c}").type)
                        for c in columns}
            else:
                src = self._pf(self.partitions[0]["path"]).schema_arrow
                cols = {c: pa.array([], src.field(c).type)
                        for c in columns}
            idname = "__doc_id" if "doc_id" in cols else "doc_id"
            cols[idname] = pa.array([], pa.int64())
            return pa.table(cols)
        tbl = pa.concat_tables(pieces)
        idcol = "__doc_id" if "doc_id" in tbl.column_names else "doc_id"
        tbl = tbl.append_column(idcol, pa.array(sorted_ids, pa.int64()))
        # restore caller order
        inv = np.empty(len(doc_ids), np.int64)
        inv[order] = np.arange(len(doc_ids))
        return tbl.take(pa.array(inv))

    def aggregate(self, query: Query | None, aggs: dict) -> dict:
        from tantivy4java_ray.aggs import run_aggregations_on_index
        if query is not None:
            leaves: list[tuple[str, str]] = []
            _collect_postings_leaves(query, self, leaves)
            if len(leaves) > 1:
                self.postings_many(leaves)
        return run_aggregations_on_index(self, query, aggs)

    def prewarm(self, fields: list[str] | None = None) -> None:
        """Eagerly load term dictionaries, posting mmaps, and fieldnorms —
        the component-prewarm analog (``SplitSearcher.preloadComponents``,
        ``native/src/prewarm/field_specific.rs``)."""
        for sid in range(self.num_shards):
            self._dict(sid)
            self._mm(sid)
            self._mm(sid, "positions")
        for f in (fields or [fc.name for fc in self.schema.text_fields
                             if fc.fieldnorms]):
            # skip fields without a norm column by CONFIG, not by
            # catching: the missing-column failure is pyarrow's
            # ArrowInvalid (not KeyError), and a caller-listed field
            # without norms should be a no-op, not an actor crash
            fcfg = self.schema.get_field(f)
            if fcfg.type is FieldType.TEXT and fcfg.fieldnorms:
                self.norms(f)

    def warmup(self, query) -> dict:
        """Query-shaped warmup — the ``warmupQuery`` analog
        (``split/SplitSearcher.java:1306``): walk the query tree, resolve
        the exact dictionary rows each leaf will touch, and prefetch their
        posting (and, for phrase leaves, position) byte ranges into the
        remote page caches in coalesced batches — WITHOUT decoding
        postings or scoring. Fieldnorms for text leaves and fast columns
        for numeric-range/exists leaves are loaded too. Prefetch is a
        no-op on local memmap indexes. Returns a summary dict."""
        from tantivy4java_ray.query import Query, parse_query
        if isinstance(query, str):
            query = parse_query(query, self.schema)
        post_runs: list[tuple[int, int]] = []
        pos_runs: list[tuple[int, int]] = []
        fields: set[str] = set()

        def add_matched(matched) -> None:
            for sid, rows, _u in matched:
                post_runs.extend((sid, int(r)) for r in np.asarray(rows))

        def add_term(field: str, term: str, positions: bool = False) -> None:
            runs = self._term_runs(field, term)
            post_runs.extend(runs)
            if positions:
                pos_runs.extend(runs)

        def walk(q: Query) -> None:
            k, p = q.kind, q.params
            if k == "term":
                field, term = p
                if self.schema.get_field(field).type is FieldType.IP_ADDR:
                    term = self._ip_term(term)
                fields.add(field)
                add_term(field, term)
            elif k == "term_set":
                field, terms = p
                if self.schema.get_field(field).type is FieldType.IP_ADDR:
                    terms = [self._ip_term(t) for t in terms]
                fields.add(field)
                for t in terms:
                    add_term(field, t)
            elif k == "phrase":
                field, elems, _slop = p
                fields.add(field)
                for _pos, w in elems:
                    add_term(field, w, positions=True)
            elif k == "fuzzy":
                field = p[0]
                fields.add(field)
                add_matched(self._match_fuzzy(*p))
            elif k in ("regex", "wildcard"):
                field, pattern, lenient = p
                fields.add(field)
                spec = self._automaton_spec(k, field, pattern, lenient)
                if spec is not None:
                    mkind, arg = spec
                    add_matched(self.match_terms(
                        field, mkind,
                        **({"prefix": arg} if mkind == "prefix"
                           else {"pattern": arg})))
            elif k == "range":
                field, lower, upper, ilo, ihi = p
                fields.add(field)
                fcfg = self.schema.get_field(field)
                if fcfg.type is FieldType.IP_ADDR:
                    lower = (self._ip_term(lower) if lower is not None
                             else None)
                    upper = (self._ip_term(upper) if upper is not None
                             else None)
                if fcfg.type in (FieldType.STRING, FieldType.TEXT,
                                 FieldType.FACET, FieldType.IP_ADDR):
                    add_matched(self.match_terms(
                        field, "range", lo=lower, hi=upper,
                        incl_lo=ilo, incl_hi=ihi))
                else:
                    self.fast_column(field)   # numeric/date: fast pages
            elif k == "exists":
                fields.add(p[0])
                self.fast_column(p[0])
            elif k == "json_exists":
                field, path = p[0], p[1]
                subpaths = p[2] if len(p) > 2 else True
                fields.add(field)
                prefs = [f"{path}\x01", f"{path}\x02"]
                if subpaths:
                    prefs.append(f"{path}.")
                for pref in prefs:
                    add_matched(self.match_terms(field, "prefix",
                                                 prefix=pref))
            elif k == "json_range":
                field, path = p[0], p[1]
                fields.add(field)
                # warm both typed windows under the path (a superset of
                # the matched terms — path-bounded, so small)
                for pref in (f"{path}\x01", f"{path}\x02"):
                    add_matched(self.match_terms(field, "prefix",
                                                 prefix=pref))
            elif k == "bool":
                for _occ, sub in p:
                    walk(sub)
            elif k == "dismax":
                for sub in p[0]:
                    walk(sub)
            elif k in ("boost", "const"):
                walk(p[0])
            elif k == "more_like_this":
                walk(self._expand_mlt(*p))
            # "all"/"none": nothing to warm

        walk(query)
        self._prefetch_runs(post_runs)
        if pos_runs:
            self._prefetch_runs(pos_runs, "positions")
        # block-max frontiers: the pruned top-k path reads these before
        # postings; parse (and thereby page in) every touched run's blob
        # now so a warmed query stays zero-GET
        for sid, r in post_runs:
            self._run_frontier(sid, r)
        for f in fields:
            fcfg = self.schema.get_field(f)
            if fcfg.type is FieldType.TEXT and fcfg.fieldnorms:
                self.norms(f)
        return {"postings_runs": len(post_runs),
                "position_runs": len(pos_runs),
                "fields": sorted(fields)}

    def per_field_component_sizes(self) -> dict[str, int]:
        """Per-(field, component) byte sizes — the reference's
        ``getPerFieldComponentSizes`` (``README.md:1265-1293``) for
        capacity planning and prewarm validation: ``"<field>.<component>"
        -> bytes``. postings/positions/blockmax sum the term
        dictionaries' per-term size columns; fieldnorm and
        fastfield/doc-store bytes come from the doc-store parquet
        column-chunk metadata (compressed — what storage actually
        holds). Metadata-only: no posting or docdata payload is read."""
        from collections import defaultdict
        out: dict[str, int] = defaultdict(int)
        for sid in range(self.num_shards):
            path = self._st.sjoin(self.index_dir, "shards",
                                  f"shard-{sid:05d}", "terms.parquet")
            if not self._st.sexists(path):
                continue
            pf = self._pf(path)
            have = set(pf.schema_arrow.names)
            # pre-frontier indexes have no bm_nbytes column (the reader
            # opens them fine; so must this introspection)
            want = [c for c in ("field", "nbytes", "pos_nbytes",
                                "bm_nbytes") if c in have]
            t = self._st.read_parquet_any(path, columns=want)
            fields = np.asarray(t.column("field")
                                .to_numpy(zero_copy_only=False), object)
            for comp, col in (("postings", "nbytes"),
                              ("positions", "pos_nbytes"),
                              ("blockmax", "bm_nbytes")):
                if col not in have:
                    continue
                sizes = np.asarray(t.column(col)
                                   .to_numpy(zero_copy_only=False),
                                   np.int64)
                codes, uniq = pd.factorize(fields, sort=False)
                sums = np.bincount(codes, weights=sizes,
                                   minlength=len(uniq)).astype(np.int64)
                for f, s in zip(uniq, sums):
                    if s:
                        out[f"{f}.{comp}"] += int(s)
        for p in self.partitions:
            path = self._st.sjoin(self.index_dir, "docdata",
                                  f"part-{p['pid']:05d}.parquet")
            md = self._st.read_parquet_metadata_any(path)
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    name = c.path_in_schema.split(".")[0]
                    size = int(c.total_compressed_size)
                    # docdata column prefixes -> (field, component):
                    # norm__X / dl__X back the fieldnorm, stored__X is
                    # the doc STORE, _phash_X is a derived fast column
                    if name.startswith("norm__"):
                        out[name[len("norm__"):] + ".fieldnorm"] += size
                    elif name.startswith("dl__"):
                        out[name[len("dl__"):] + ".fieldnorm"] += size
                    elif name.startswith("stored__"):
                        out[name[len("stored__"):] + ".store"] += size
                    elif name.startswith("_phash_"):
                        out[name[len("_phash_"):] + ".fastfield"] += size
                    else:
                        out[name + ".fastfield"] += size
        return dict(sorted(out.items()))

    def cache_stats(self) -> dict:
        """Per-tier cache telemetry — the ``getCacheStats`` /
        ``getComponentCacheStatus`` analog
        (``split/SplitCacheManager.java:983-1005``). Decoded-postings /
        positions / const-union LRUs report hit/miss/entries/bytes;
        remote blobs report issued ranged GETs and node-local disk-cache
        re-warms (zero for local memmap indexes)."""
        out = {}
        for name, cache, nbytes, cap in (
                ("postings", self._post_cache, self._post_cache_bytes,
                 self.postings_cache_max),
                ("positions", self._pos_cache, self._pos_cache_bytes,
                 self.postings_cache_max),
                ("union", self._union_cache, self._union_cache_bytes,
                 self.union_cache_max),
                ("docstore", self._doc_cache, self._doc_cache_bytes,
                 self.doc_cache_max)):
            h, m = self._cstats[name]
            out[name] = {"hits": h, "misses": m, "entries": len(cache),
                         "bytes": int(nbytes), "max_bytes": int(cap)}
        out["df"] = {"entries": len(self._df_cache)}
        gets = disk_hits = 0
        for mm in list(self._post_mm.values()) + list(self._pos_mm.values()):
            gets += getattr(mm, "gets", 0)
            disk_hits += getattr(mm, "disk_hits", 0)
        out["remote"] = {"ranged_gets": gets, "disk_cache_hits": disk_hits}
        return out

    def facet_counts(self, field: str, prefix: str = "/",
                     query: Query | None = None) -> list[tuple[str, int]]:
        """Doc counts for child facets directly under ``prefix``
        (``util/Facet.java`` counting semantics; ancestors are indexed so
        each child count is one dictionary/posting lookup)."""
        from tantivy4java_ray.functions.scalars import facet_parts
        depth = len(facet_parts(prefix)) if prefix != "/" else 0
        pref = "" if prefix == "/" else prefix.rstrip("/")
        child_set: set[str] = set()
        for sid, _rows, uidx in self.match_terms(
                field, "prefix", prefix=(pref + "/") if pref else "/"):
            fs = self._field_slice(sid, field)
            child_set.update(t for t in fs["uterms"][uidx]
                             if len(facet_parts(t)) == depth + 1)
        children = sorted(child_set)
        qdocs = None
        if query is not None:
            qdocs = self.evaluate(query)[0]
        # dictionary df is a GLOBAL stat: on a doc-range-pinned leaf it
        # would count docs the leaf does not own (root merges would then
        # multiply every facet by the leaf count) — pinned readers count
        # via their range-decoded postings instead
        range_pinned = (self.doc_lo, self.doc_hi) != (0, self.max_doc)
        out = []
        for child in children:
            if qdocs is None and not range_pinned:
                out.append((child, self.doc_freq(field, child)))
            elif qdocs is None:
                out.append((child, int(len(self.postings(field, child)[0]))))
            else:
                docs, _ = self.postings(field, child)
                out.append((child, int(len(np.intersect1d(
                    docs, qdocs, assume_unique=True)))))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _ranges_within(counts: np.ndarray) -> np.ndarray:
    """[3, 2] -> [0, 1, 2, 0, 1] (per-group offsets, vectorized)."""
    if not len(counts):
        return np.empty(0, np.int64)
    total = int(counts.sum())
    cum = np.cumsum(counts)
    return (np.arange(total, dtype=np.int64)
            - np.repeat(cum - counts, counts))


def _prefix_successor(p: str) -> str | None:
    """Smallest string > every string with prefix ``p`` (None = no bound)."""
    while p and ord(p[-1]) >= 0x10FFFF:
        p = p[:-1]
    if not p:
        return None
    return p[:-1] + chr(ord(p[-1]) + 1)


_RE_META = set(r"\.^$*+?()[]{}|")


def _literal_prefix_of_regex(pattern: str) -> str:
    """Longest literal prefix of a regex (conservative: stops at any
    metacharacter, excludes a literal that the NEXT char quantifies
    ('ab*c' -> 'a'), and yields no prefix at all when the pattern
    contains an alternation — a top-level '|' restarts matching from
    the beginning ('jo.n|apple')."""
    if "|" in pattern:
        return ""
    out = []
    for i, c in enumerate(pattern):
        if c in _RE_META:
            break
        if i + 1 < len(pattern) and pattern[i + 1] in "*+?{":
            break
        out.append(c)
    return "".join(out)


def encode_f64_sortable(v: float) -> str:
    """Order-preserving fixed-width (16 hex chars) encoding of float64:
    flip the sign bit for positives, complement for negatives — the
    standard trick so lexicographic order on the encoding equals numeric
    order (the reference types JSON numeric subpaths the same way,
    native/src/query/json_query.rs i64/f64 fast paths)."""
    bits = np.float64(v + 0.0).view(np.uint64)  # -0.0 -> 0.0: one term
    if bits & np.uint64(1 << 63):
        bits = ~bits
    else:
        bits = bits | np.uint64(1 << 63)
    return format(int(bits), "016x")


def encode_f64_sortable_array(vals: np.ndarray) -> np.ndarray:
    """Vectorized ``encode_f64_sortable`` -> object array of hex strings."""
    v64 = np.ascontiguousarray(vals, np.float64) + 0.0  # -0.0 -> 0.0
    bits = v64.view(np.uint64)
    neg = (bits & np.uint64(1 << 63)) != 0
    out = np.where(neg, ~bits, bits | np.uint64(1 << 63))
    return np.array([format(int(b), "016x") for b in out], dtype=object)


def _top_k(docs: np.ndarray, scores: np.ndarray, k: int
           ) -> list[tuple[float, int]]:
    """Ties broken by doc_id ascending (pinned by tests)."""
    n = len(docs)
    if n == 0:
        return []
    if n > k:
        # exact tie handling: keep everything scoring >= the kth score, then
        # lexsort (doc-id asc breaks ties) — avoids dropping low-doc-id ties
        kth = scores[np.argpartition(-scores, k - 1)[k - 1]]
        keep = scores >= kth
        docs, scores = docs[keep], scores[keep]
    order = np.lexsort((docs, -scores))[:k]
    return [(float(scores[i]), int(docs[i])) for i in order]


def _phrase_slop0_counts(n_cand: int,
                         pos_lookup: list[tuple[np.ndarray, np.ndarray,
                                                np.ndarray]],
                         offsets: list[int]
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized slop-0 phrase counting across ALL candidate docs.

    A match at base b needs (b + offsets[i]) in pos_i for every term i;
    intersecting composite keys ``cand_index * 2^32 + (p - offset +
    bias)`` across terms yields exactly the (candidate, base) match
    pairs. Keys use the CANDIDATE INDEX (always < 2^32), never the
    global doc id — int64 doc ids >= 2^31 would overflow the pack.
    Returns (candidate_indices, per-candidate match counts)."""
    bias = np.int64(max(offsets))
    shift = np.int64(1) << 32
    keys: np.ndarray | None = None
    for (off, idx, pos), o in zip(pos_lookup, offsets):
        starts = off[idx]
        lens = (off[idx + 1] - starts).astype(np.int64)
        total = int(lens.sum())
        gbase = np.repeat(np.cumsum(lens) - lens, lens)
        gidx = np.repeat(starts, lens) + (np.arange(total) - gbase)
        cirep = np.repeat(np.arange(n_cand, dtype=np.int64), lens)
        pk = pos[gidx].astype(np.int64) - np.int64(o) + bias
        if len(pk) and int(pk.max()) >= int(shift):
            # a position this close to 2^32 would carry into the
            # candidate-index half of the packed key (ADVICE r2);
            # positions are token indices, so this cannot happen for
            # real documents — fail loudly rather than corrupt
            raise OverflowError(
                "phrase position exceeds 2^32 after bias; cannot pack")
        k = cirep * shift + pk
        keys = k if keys is None else np.intersect1d(
            keys, k, assume_unique=True)
        if not len(keys):
            return np.empty(0, np.int64), np.empty(0, np.uint32)
    ci, cnt = np.unique(keys >> np.int64(32), return_counts=True)
    return ci, cnt.astype(np.uint32)


def _count_phrase_matches(plists: list[np.ndarray], offsets: list[int],
                          slop: int) -> int:
    """Count alignments; slop = allowed total positional play (span-based)."""
    base = plists[0] - offsets[0]
    if slop == 0:
        ok = np.ones(len(base), bool)
        for pl, off in zip(plists[1:], offsets[1:]):
            ok &= np.isin(base, pl - off)
        return int(ok.sum())
    # exact span check: a base position b matches iff some window
    # [lo, lo+slop] contains b AND >= 1 normalized candidate from every
    # other term. The window's min is either b or a candidate <= b, so
    # enumerating lo over {b} + (candidates in [b-slop, b]) is exhaustive
    # — no greedy nearest-candidate choice (which can reject valid spans:
    # base=10, cands {8,12}, third term {12}, slop=2).
    others = [pl - off for pl, off in zip(plists[1:], offsets[1:])]
    cnt = 0
    for b in base:
        lows = {int(b)}
        for cand in others:
            i0 = int(np.searchsorted(cand, b - slop, side="left"))
            i1 = int(np.searchsorted(cand, b, side="right"))
            lows.update(int(c) for c in cand[i0:i1])
        for lo in lows:
            hi = lo + slop
            ok = True
            for cand in others:
                j = int(np.searchsorted(cand, lo, side="left"))
                if j >= len(cand) or cand[j] > hi:
                    ok = False
                    break
            if ok:
                cnt += 1
                break
    return cnt


def _probe_sorted(haystack: np.ndarray,
                  needles: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Membership of ``needles`` in SORTED ``haystack`` via one
    searchsorted probe. Returns ``(hit_mask, insert_idx)`` — callers
    gather parallel arrays with ``haystack_payload[idx[hit]]``."""
    idx = np.searchsorted(haystack, needles)
    ok = idx < len(haystack)
    hit = np.zeros(len(needles), bool)
    hit[ok] = haystack[idx[ok]] == needles[ok]
    return hit, idx


def _edit_distance(a: str, b: str, cap: int, transposition: bool,
                   prefix: bool = False) -> int:
    """Banded Damerau-Levenshtein with early exit above ``cap``.

    ``prefix=True`` returns the minimum distance from ``a`` to any
    PREFIX of ``b`` (tantivy ``FuzzyTermQuery::new_prefix`` semantics:
    the automaton accepts a term when some prefix of it is within the
    edit budget of the query string)."""
    if prefix:
        # prefixes longer than len(a)+cap exceed the cap by length alone
        b = b[:len(a) + cap]
    la, lb = len(a), len(b)
    if (la - lb if prefix else abs(la - lb)) > cap:
        return cap + 1
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = max(1, i - cap)
        hi = min(lb, i + cap)
        if lo > 1:
            cur[lo - 1] = cap + 1
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (transposition and i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        if hi < lb:
            cur[hi + 1:] = [cap + 1] * (lb - hi)
        if min(cur[max(0, lo - 1):hi + 1]) > cap:
            return cap + 1
        prev2, prev = prev, cur
    if prefix:
        # best over ALL prefixes of b = min of the final row, restricted
        # to the valid band (cells below it hold stale zeros)
        return min(prev[max(0, la - cap):min(lb, la + cap) + 1])
    return prev[lb]


def _to_us(v) -> int:
    return int(np.datetime64(v, "us").astype(np.int64))


def _wand_eligible(q: Query, schema) -> bool:
    """WAND applies to pure SHOULD-unions of term queries over fields
    that HAVE fieldnorms (TEXT built with fieldnorms=True): the cursor
    scores through the norm-id cache, and norm__<field> columns only
    exist for such fields — anything else must take the scan path."""
    def _norm_field(field: str) -> bool:
        try:
            fcfg = schema.get_field(field)
        except KeyError:
            return False
        return fcfg.type is FieldType.TEXT and fcfg.fieldnorms

    if q.kind == "term":
        return _norm_field(q.params[0])
    if q.kind == "boost":
        return _wand_eligible(q.params[0], schema)
    if q.kind == "bool":
        return all(o == Occur.SHOULD and sub.kind == "term"
                   and _norm_field(sub.params[0])
                   for o, sub in q.params)
    return False


def _term_shape(q: Query) -> tuple[str, str, float] | None:
    """(field, term, boost) when the query is a plain scored term
    (possibly boost-wrapped) — the shape the pruned block-max top-k
    path handles."""
    if q.kind == "term":
        return q.params[0], q.params[1], 1.0
    if q.kind == "boost":
        inner = _term_shape(q.params[0])
        if inner is not None:
            return inner[0], inner[1], inner[2] * q.params[1]
    return None


def _collect_postings_leaves(q: Query, reader: "IndexReader",
                             out: list[tuple[str, str]]) -> None:
    """All (field, term) pairs the query will pull postings for, with the
    same per-field term normalization ``evaluate`` applies — feeds
    ``postings_many`` so a cold multi-term query decodes in one batched
    pass instead of per-term."""
    k = q.kind
    if k == "term":
        field, term = q.params
        if reader.schema.get_field(field).type is FieldType.IP_ADDR:
            term = reader._ip_term(term)
        out.append((field, term))
    elif k == "term_set":
        field, terms = q.params
        is_ip = reader.schema.get_field(field).type is FieldType.IP_ADDR
        out.extend((field, reader._ip_term(t) if is_ip else t)
                   for t in terms)
    elif k == "bool":
        for _occur, sub in q.params:
            _collect_postings_leaves(sub, reader, out)
    elif k == "dismax":
        for sub in q.params[0]:
            _collect_postings_leaves(sub, reader, out)
    elif k in ("boost", "const"):
        _collect_postings_leaves(q.params[0], reader, out)


def _collect_union_terms(q: Query, boost: float = 1.0
                         ) -> list[tuple[str, str, float]]:
    if q.kind == "term":
        return [(q.params[0], q.params[1], boost)]
    if q.kind == "boost":
        return _collect_union_terms(q.params[0], boost * q.params[1])
    if q.kind == "bool":
        out = []
        for _, sub in q.params:
            out.extend(_collect_union_terms(sub, boost))
        return out
    return []


class _TermCursor:
    """Streaming cursor over one term's posting runs for WAND traversal.

    Decodes one 128-block at a time; skips whole blocks via the
    ``last_doc`` skip array and bounds scores via ``max_tf`` block-max
    metadata."""

    __slots__ = ("reader", "field", "runs", "run_i", "skip", "mm", "base",
                 "block_i", "docs", "tfs", "pos", "weight", "norm_cache",
                 "norms", "min_norm", "max_score", "exhausted", "offset",
                 "ord", "doc_lo", "doc_hi", "bm_bounds")

    @classmethod
    def open_runs(cls, reader: IndexReader, field: str, term: str,
                  boost: float) -> list["_TermCursor"]:
        """One cursor PER RUN: salted hot terms spread runs across shards
        with overlapping doc ranges, but doc *sets* are disjoint, so WAND
        treats each run as an independent posting list — contributions for
        any doc come from exactly one of them."""
        run_refs = reader._term_runs(field, term)
        if not run_refs:
            return []
        df = sum(int(reader._dict(sid)["df"][r]) for sid, r in run_refs)
        weight = np.float32(boost * reader.idf(df) * (reader.k1 + 1.0))
        norm_cache = reader._norm_factor_cache(field)
        norms = reader.norms(field)
        min_norm = float(norm_cache.min())
        out = []
        for sid, r in run_refs:
            d = reader._dict(sid)
            self = cls()
            self.reader = reader
            self.field = field
            self.doc_lo = reader.doc_lo
            self.doc_hi = reader.doc_hi
            run_base = int(d["run_base"][r])
            # skip BEFORE fetching: on a doc-range-pinned leaf an
            # out-of-range run must not cost a full ranged GET
            if reader.doc_range is not None and run_base >= reader.doc_hi:
                continue
            # the run's byte slice (memmap view / one remote ranged GET)
            self.runs = [(run_base, 0, reader._run_bytes(sid, r))]
            self.weight = weight
            self.norm_cache = norm_cache
            self.norms = norms
            self.min_norm = min_norm
            self.run_i = -1
            self.exhausted = False
            self._next_run()
            if reader.doc_range is not None and not self.exhausted \
                    and self.doc < reader.doc_lo:
                self.seek(reader.doc_lo)
            if self.exhausted:
                continue
            fr = reader._run_frontier(sid, r)
            if fr is not None:
                # EXACT per-block maxima from the frontier sidecar — the
                # max_tf/global-min-norm bound below keeps ~100% of
                # blocks on realistic corpora (see block_frontier_blob)
                off, ftf, fnid = fr
                s = (weight * ftf) / (ftf + norm_cache[fnid])
                self.bm_bounds = np.maximum.reduceat(s, off[:-1])
                self.max_score = float(self.bm_bounds.max())
            else:
                self.bm_bounds = None
                gmax_tf = float(pcodec.read_skip(
                    self.runs[0][2], self.runs[0][1]).max_tf.max())
                self.max_score = (float(weight) * gmax_tf
                                  / (gmax_tf + min_norm))
            out.append(self)
        return out

    def _next_run(self) -> None:
        self.run_i += 1
        if self.run_i >= len(self.runs):
            self.exhausted = True
            return
        self.base, self.offset, self.mm = self.runs[self.run_i]
        self.skip = pcodec.read_skip(self.mm, self.offset)
        self.block_i = -1
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        if bi >= self.skip.nblocks:
            self._next_run()
            return
        self.block_i = bi
        d, t = pcodec.decode_block(self.mm, self.skip, bi, self.offset)
        self.docs = d.astype(np.int64) + self.base
        self.tfs = t
        self.pos = 0

    @property
    def doc(self) -> int:
        return int(self.docs[self.pos])

    def block_max_score(self) -> float:
        # frontier bounds are EXACT per-block maxima (precomputed in
        # open_runs); the max_tf/min-norm formula is the fallback for
        # runs without a sidecar. Runs per pivot in the hottest WAND loop.
        if self.bm_bounds is not None:
            return float(self.bm_bounds[self.block_i])
        mt = float(self.skip.max_tf[self.block_i])
        return float(self.weight) * mt / (mt + self.min_norm)

    def score_current(self) -> np.float32:
        # float32 arithmetic in the exact op order of the vectorized path,
        # so WAND and scan produce bit-identical scores
        tf = np.float32(self.tfs[self.pos])
        nid = self.norms[self.doc - self.doc_lo]
        return self.weight * tf / (tf + self.norm_cache[nid])

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.docs):
            self._load_block(self.block_i + 1)
        if not self.exhausted and self.doc >= self.doc_hi:
            self.exhausted = True

    def seek(self, target: int) -> None:
        """Advance to the first doc >= target, skipping whole blocks."""
        while not self.exhausted:
            run_last = int(self.skip.last_doc[-1]) + self.base
            if target > run_last:
                self._next_run()
                continue
            local = target - self.base
            bi = int(np.searchsorted(self.skip.last_doc, local, side="left"))
            if bi != self.block_i:
                self._load_block(bi)
            self.pos = int(np.searchsorted(self.docs, target, side="left"))
            if self.pos >= len(self.docs):
                self._load_block(self.block_i + 1)
                continue
            if self.doc >= self.doc_hi:
                self.exhausted = True
            return


def block_max_wand(cursors: list[_TermCursor], k: int,
                   reader: IndexReader) -> list[tuple[float, int]]:
    """Top-k union with block-max WAND (skips blocks that cannot beat the
    current kth score). Returns (score, doc_id) score-desc, doc-asc ties."""
    if k <= 0:
        return []
    heap: list[tuple[float, int]] = []  # min-heap of (score, -doc)
    threshold = -np.inf
    cursors = [c for c in cursors if not c.exhausted]
    while True:
        cursors = [c for c in cursors if not c.exhausted]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.doc)
        # find pivot
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(cursors):
            acc += c.max_score
            # >= so a candidate tying the kth score is still scored —
            # it can displace the kth hit on the doc-id tie-break
            if acc >= threshold or len(heap) < k:
                pivot_i = i
                break
        if pivot_i < 0:
            break
        pivot_doc = cursors[pivot_i].doc
        if cursors[0].doc == pivot_doc:
            # block-max check: refined bound at the pivot
            bm = sum(c.block_max_score() for c in cursors
                     if c.doc == pivot_doc)
            if bm >= threshold or len(heap) < k:
                # accumulate in float32 in original term order — bit-equal
                # to the vectorized scatter-add
                matching = sorted((c for c in cursors if c.doc == pivot_doc),
                                  key=lambda c: c.ord)
                score = np.float32(0.0)
                for c in matching:
                    score = np.float32(score + c.score_current())
                item = (float(score), -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                else:
                    if item > heap[0]:
                        heapq.heapreplace(heap, item)
                if len(heap) == k:
                    threshold = heap[0][0]
            for c in cursors:
                if not c.exhausted and c.doc == pivot_doc:
                    c.advance()
        else:
            for c in cursors:
                if c.doc < pivot_doc:
                    c.seek(pivot_doc)
    out = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return [(float(s), int(-nd)) for s, nd in out]


# ---------------------------------------------------------------------------
# Ray Data actor-pool batch search
# ---------------------------------------------------------------------------

class QueryExecutor:
    """Actor-pool stage: opens the index once per actor (``__init__``),
    executes a batch of query strings per call."""

    def __init__(self, index_dir: str, limit: int = 10,
                 method: str = "auto"):
        self.reader = IndexReader(index_dir)
        self.limit = limit
        self.method = method

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, queries = batch.column("query_id").to_pylist(), \
            batch.column("query").to_pylist()
        out_qid, out_rank, out_doc, out_score = [], [], [], []
        for qid, qtext in zip(qids, queries):
            res = self.reader.search(qtext, self.limit, self.method)
            for rank, (score, doc) in enumerate(res.hits):
                out_qid.append(qid)
                out_rank.append(rank)
                out_doc.append(doc)
                out_score.append(score)
        # query_id keeps the INPUT column's type: inference on an empty
        # list (a batch where nothing matched) would give Arrow `null`
        # and blocks would disagree on schema
        return pa.table({"query_id": pa.array(
                             out_qid, batch.column("query_id").type),
                         "rank": pa.array(out_rank, pa.int32()),
                         "doc_id": pa.array(out_doc, pa.int64()),
                         "score": pa.array(out_score, pa.float32())})


def matching_docs_dataset(index_dir: str, query: Query | str,
                          columns: list[str] | None = None,
                          concurrency: int = 4):
    """Streaming doc retrieval: all docs matching ``query`` as a Ray
    Dataset (the reference streams Arrow RecordBatches over FFI with
    bounded channels, ``streaming_doc_retrieval.rs``; here query results
    are simply a Dataset with the executor providing backpressure).

    The matched doc-id set is broadcast once (``ray.put``); each task
    reads only its partition's parquet row groups and takes its local
    rows — the positional-key join, no shuffle."""
    import ray
    import ray.data

    reader = IndexReader(index_dir)
    if isinstance(query, str):
        from tantivy4java_ray.query import parse_query
        query = parse_query(query, reader.schema)
    doc_ids = reader.evaluate(query)[0]
    ids_ref = ray.put(doc_ids)
    specs = [{"pid": p["pid"], "path": p["path"],
              "row_groups": p["row_groups"], "doc_base": p["doc_base"],
              "num_docs": p["num_docs"]} for p in reader.partitions]

    def fetch(batch: pa.Table):
        ids = ray.get(ids_ref)
        for spec in batch.to_pylist():
            lo = np.searchsorted(ids, spec["doc_base"])
            hi = np.searchsorted(ids, spec["doc_base"] + spec["num_docs"])
            if lo == hi:
                continue
            local = (ids[lo:hi] - spec["doc_base"]).astype(np.int64)
            from tantivy4java_ray.storage import parquet_file_any
            pf = parquet_file_any(spec["path"])
            tbl = pf.read_row_groups(spec["row_groups"], columns=columns)
            out = tbl.take(pa.array(local))
            idc = "__doc_id" if "doc_id" in out.column_names else "doc_id"
            yield out.append_column(idc, pa.array(ids[lo:hi], pa.int64()))

    return ray.data.from_items(
        specs, override_num_blocks=len(specs)).map_batches(
        fetch, batch_format="pyarrow", batch_size=None,
        concurrency=concurrency, num_cpus=1)


def highlighted_docs_dataset(index_dir: str, query, *,
                             field: str = "text", max_chars: int = 150,
                             columns: list[str] | None = None,
                             concurrency: int = 4):
    """End-to-end search-and-highlight as one streaming Dataset pipeline:
    every doc matching ``query``, fetched by positional parquet reads (no
    shuffle), annotated with a best-window ``<b>``-highlighted ``snippet``
    column (reference: ``SnippetGenerator.java`` applied per hit after
    ``SplitSearcher.search``; ``native/src/query/snippet.rs:16-152``).

    The snippet stage is a stateful actor-pool ``map_batches`` class —
    term set + analyzer are built once per actor in ``__init__``; the
    per-batch work is the windowed highlight over the Arrow text column,
    so the pipeline streams at corpus scale with backpressure."""
    import ray.data  # noqa: F401  (ensures Data is importable on driver)

    reader = IndexReader(index_dir)
    if isinstance(query, str):
        from tantivy4java_ray.query import parse_query
        query = parse_query(query, reader.schema)
    fcfg = reader.schema.get_field(field)
    tokenizer = fcfg.tokenizer
    cols = list(dict.fromkeys((columns or []) + [field]))
    ds = matching_docs_dataset(index_dir, query, columns=cols,
                               concurrency=concurrency)

    class Snippeter:
        def __init__(self):
            from tantivy4java_ray.functions.snippet import SnippetGenerator
            self.gen = SnippetGenerator(query, field, tokenizer, max_chars)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column(field).to_pylist()
            snips = [self.gen.snippet_from_text(t) for t in texts]
            return batch.append_column(
                "snippet", pa.array(snips, pa.string()))

    # autoscaling (1, N) pool: a FIXED pool sized == cluster CPUs would
    # pin every CPU on actors and starve the upstream fetch tasks
    return ds.map_batches(Snippeter, batch_format="pyarrow",
                          batch_size=4096, concurrency=(1, concurrency),
                          num_cpus=1)


# ---------------------------------------------------------------------------
# split-utility analogs (QuickwitSplit.readSplitMetadata/listSplitFiles/
# validateSplit, QuickwitSplit.java:493-556)
# ---------------------------------------------------------------------------

def read_index_metadata(index_dir: str) -> dict:
    """Manifest snapshot: stats, schema, partitions, shards."""
    r = IndexReader(index_dir)
    return {"num_docs": r.num_docs, "max_doc": r.max_doc,
            "num_shards": r.num_shards,
            "schema": r.schema.to_dict(), "stats": r.stats,
            "num_partitions": len(r.partitions),
            "committed": r.state.get("committed", False)}


def list_index_files(index_dir: str) -> list[str]:
    from tantivy4java_ray import storage as st
    return sorted(f for f in st.swalk_files(index_dir)
                  if not os.path.basename(f).startswith(".tmp")
                  and ".tmp-" not in os.path.basename(f))


def validate_index(index_dir: str) -> list[str]:
    """Structural validation -> list of problems (empty = valid):
    shard files exist, dictionary offsets within bounds, dict sorted,
    partition doc ranges contiguous, df sums consistent."""
    problems: list[str] = []
    r = IndexReader(index_dir)
    expected_base = 0
    for p in r.partitions:
        if p["doc_base"] != expected_base:
            problems.append(f"partition {p['pid']}: doc_base "
                            f"{p['doc_base']} != expected {expected_base}")
        expected_base = p["doc_base"] + p["num_docs"]
        if not r._st.sexists(r._st.sjoin(
                index_dir, "docdata", f"part-{p['pid']:05d}.parquet")):
            problems.append(f"partition {p['pid']}: docdata missing")
    if expected_base != r.max_doc:
        problems.append(f"max_doc {r.max_doc} != partition sum "
                        f"{expected_base}")
    for sid in range(r.num_shards):
        d = r._dict(sid)
        if d is None:
            continue
        mm = r._mm(sid)
        size = len(mm) if mm is not None else 0
        ends = d["offset"] + d["nbytes"]
        if len(ends) and int(ends.max()) > size:
            problems.append(f"shard {sid}: posting offsets exceed file "
                            f"({int(ends.max())} > {size})")
        keys = d["key"]
        if len(keys) > 1 and not bool(np.all(keys[:-1] <= keys[1:])):
            problems.append(f"shard {sid}: term dictionary not sorted")
        hasbm = d["bm_offset"] >= 0
        if hasbm.any():
            bmm = r._mm(sid, "blockmax")
            bsize = len(bmm) if bmm is not None else 0
            bends = (d["bm_offset"] + d["bm_nbytes"])[hasbm]
            if int(bends.max()) > bsize:
                problems.append(
                    f"shard {sid}: blockmax offsets exceed file "
                    f"({int(bends.max())} > {bsize})")
    return problems


class SearchPool:
    """Long-lived query-actor pool (SURVEY.md §3.2: actors pinned to the
    index, shards mmap'd once in ``__init__``; driver broadcasts queries
    and merges). Unlike ``batch_search`` (a fresh Dataset pipeline per
    call), the pool persists across calls — the steady-state QPS surface.
    """

    def __init__(self, index_dir: str, num_actors: int = 4,
                 limit: int = 10):
        import ray

        @ray.remote(num_cpus=1)
        class _QueryActor:
            def __init__(self, index_dir: str):
                self.reader = IndexReader(index_dir)
                self.reader.prewarm()

            def search_many(self, queries: list[str], limit: int
                            ) -> list[list[tuple[float, int]]]:
                from tantivy4java_ray import storage as st
                from tantivy4java_ray.query import parse_query
                qs = [parse_query(q, self.reader.schema)
                      if isinstance(q, str) else q for q in queries]
                # local indexes: decode the WHOLE slice's uncached terms
                # in one width-grouped pass per shard — a cold batch of
                # 60+ single-term queries collapses to a handful of
                # kernel calls. Remote indexes skip this: the pruned
                # per-query path pages in bytes ~ k instead of whole runs
                if not st.is_url(self.reader.index_dir):
                    leaves: list[tuple[str, str]] = []
                    for q in qs:
                        _collect_postings_leaves(q, self.reader, leaves)
                    if len(leaves) > 1:
                        self.reader.postings_many(leaves)
                # flat ndarray wire form (see ShardedSearchPool): the
                # object store zero-copies arrays where per-hit python
                # tuples pay pickle per element
                counts = np.empty(len(qs), np.int64)
                sc_parts, dc_parts = [], []
                for i, q in enumerate(qs):
                    hits = self.reader.search(q, limit).hits
                    counts[i] = len(hits)
                    if hits:
                        sc_parts.append(np.array([h[0] for h in hits],
                                                 np.float64))
                        dc_parts.append(np.array([h[1] for h in hits],
                                                 np.int64))
                scores = (np.concatenate(sc_parts) if sc_parts
                          else np.empty(0, np.float64))
                docs = (np.concatenate(dc_parts) if dc_parts
                        else np.empty(0, np.int64))
                return counts, scores, docs

            def warmup(self, query: str) -> dict:
                return self.reader.warmup(query)

        self._actors = [_QueryActor.remote(index_dir)
                        for _ in range(num_actors)]
        self.limit = limit
        import ray as _ray
        _ray.get([a.__ray_ready__.remote() for a in self._actors])

    def search_many(self, queries: list[str],
                    limit: int | None = None) -> list[list]:
        """Round-robin the query set over the pool; order preserved."""
        import ray
        limit = limit or self.limit
        n = len(self._actors)
        chunks: list[list[str]] = [[] for _ in range(n)]
        owners: list[list[int]] = [[] for _ in range(n)]
        for i, q in enumerate(queries):
            chunks[i % n].append(q)
            owners[i % n].append(i)
        futs = [a.search_many.remote(c, limit)
                for a, c in zip(self._actors, chunks) if c]
        out: list[list] = [None] * len(queries)  # type: ignore[list-item]
        fi = 0
        for ai in range(n):
            if not chunks[ai]:
                continue
            counts, scores, docs = ray.get(futs[fi])
            cuts = np.zeros(len(counts) + 1, np.int64)
            np.cumsum(counts, out=cuts[1:])
            sc, dc = scores.tolist(), docs.tolist()
            for k, idx in enumerate(owners[ai]):
                out[idx] = list(zip(sc[cuts[k]:cuts[k + 1]],
                                    dc[cuts[k]:cuts[k + 1]]))
            fi += 1
        return out

    def warmup(self, query: str) -> list[dict]:
        """warmupQuery across the pool: every actor prefetches exactly
        the pages ``query`` touches, so a subsequent ``search_many`` on
        remote (object-store) indexes is zero-GET for that query shape
        (``split/SplitSearcher.java:1306`` analog)."""
        import ray
        return ray.get([a.warmup.remote(query) for a in self._actors])

    def shutdown(self) -> None:
        import ray
        for a in self._actors:
            ray.kill(a)
        self._actors = []


def split_doc_ranges(index_dir: str, n: int) -> list[tuple[int, int]]:
    """Partition-aligned contiguous doc ranges, balanced by doc count —
    the leaf assignment for ``ShardedSearchPool``. Ranges cover the
    whole ID SPACE (``max_doc``), not just alive docs: tombstoned ids
    stay addressable inside their partition's range."""
    r = IndexReader(index_dir)
    parts = r.partitions
    n = max(1, min(n, len(parts)))
    target = r.max_doc / n
    ranges: list[tuple[int, int]] = []
    lo = 0
    acc = 0
    for i, p in enumerate(parts):
        acc += p["num_docs"]
        remaining = len(parts) - i - 1
        still_to_cut = n - len(ranges) - 1
        if len(ranges) < n - 1 and (acc >= target
                                    or remaining <= still_to_cut):
            hi = p["doc_base"] + p["num_docs"]
            ranges.append((lo, hi))
            lo, acc = hi, 0
    ranges.append((lo, r.max_doc))
    return [(a, b) for a, b in ranges if b > a]


class ShardedSearchPool:
    """Leaf/root distributed search (SURVEY.md §3.2): each actor is
    pinned to a disjoint partition-aligned doc range and opens a
    range-restricted ``IndexReader`` — its resident fieldnorm/docdata
    set is O(index / num_actors), unlike ``SearchPool`` where every
    actor holds the whole index. Global BM25 stats come from the
    manifest, so per-leaf top-k lists merge EXACTLY (every doc is fully
    scored by exactly one leaf) — the reference's per-split leaf search
    + caller merge contract (``async_impl.rs:1007``)."""

    def __init__(self, index_dir: str, num_actors: int = 4,
                 limit: int = 10, prewarm: bool = True):
        import ray

        ranges = split_doc_ranges(index_dir, num_actors)

        @ray.remote(num_cpus=1)
        class _LeafActor:
            def __init__(self, index_dir: str, lo: int, hi: int,
                         prewarm: bool):
                self.reader = IndexReader(index_dir, doc_range=(lo, hi))
                if prewarm:
                    self.reader.prewarm()

            def search_many(self, queries: list[str], limit: int
                            ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
                from tantivy4java_ray import storage as st
                from tantivy4java_ray.query import parse_query
                qs = [parse_query(q, self.reader.schema)
                      if isinstance(q, str) else q for q in queries]
                # local leaves: gather-decode the whole slice's in-window
                # blocks in one pass per shard (see postings_many);
                # remote leaves keep the per-query pruned GET shape
                if not st.is_url(self.reader.index_dir):
                    leaves: list[tuple[str, str]] = []
                    for q in qs:
                        _collect_postings_leaves(q, self.reader, leaves)
                    if len(leaves) > 1:
                        self.reader.postings_many(leaves)
                # flat-array wire form: (counts, scores, docs) — plasma
                # zero-copies ndarrays, where a list of 8×500×k python
                # tuples dominated the root's warm wall time
                counts = np.empty(len(qs), np.int64)
                sc_parts, dc_parts = [], []
                for i, q in enumerate(qs):
                    hits = self.reader.search(q, limit).hits
                    counts[i] = len(hits)
                    if hits:
                        sc_parts.append(np.array([h[0] for h in hits],
                                                 np.float64))
                        dc_parts.append(np.array([h[1] for h in hits],
                                                 np.int64))
                scores = (np.concatenate(sc_parts) if sc_parts
                          else np.empty(0, np.float64))
                docs = (np.concatenate(dc_parts) if dc_parts
                        else np.empty(0, np.int64))
                return counts, scores, docs

            def aggregate_partial(self, query_blob: bytes,
                                  specs_blob: bytes) -> bytes:
                import pickle
                from tantivy4java_ray.aggs import merged_partial_on_index
                query = pickle.loads(query_blob)
                specs = pickle.loads(specs_blob)
                if isinstance(query, str):
                    from tantivy4java_ray.query import parse_query
                    query = parse_query(query, self.reader.schema)
                return pickle.dumps(merged_partial_on_index(
                    self.reader, query, specs, distributed=False))

            def warmup(self, query: str) -> dict:
                return self.reader.warmup(query)

        self._actors = [_LeafActor.remote(index_dir, lo, hi, prewarm)
                        for lo, hi in ranges]
        self.ranges = ranges
        self.limit = limit
        ray.get([a.__ray_ready__.remote() for a in self._actors])

    def search_many(self, queries: list[str],
                    limit: int | None = None) -> list[list]:
        """Every leaf sees every query (it owns a doc subset); the root
        merge keeps the global top-k by (score desc, doc asc). Leaves
        ship flat (counts, scores, docs) ndarrays — zero-copy out of the
        object store — and the merge is ONE lexsort over all leaves'
        hits, not a python sort per query."""
        import ray
        limit = limit or self.limit
        per_leaf = ray.get([a.search_many.remote(queries, limit)
                            for a in self._actors])
        nq = len(queries)
        qids = np.concatenate([np.repeat(np.arange(nq, dtype=np.int64),
                                         cnt) for cnt, _s, _d in per_leaf])
        scores = np.concatenate([s for _c, s, _d in per_leaf])
        docs = np.concatenate([d for _c, _s, d in per_leaf])
        order = np.lexsort((docs, -scores, qids))
        qs_, sc_, dc_ = qids[order], scores[order], docs[order]
        starts = np.searchsorted(qs_, np.arange(nq + 1))
        out = []
        for qi in range(nq):
            s = int(starts[qi])
            e = min(int(starts[qi + 1]), s + limit)
            out.append(list(zip(sc_[s:e].tolist(), dc_[s:e].tolist())))
        return out

    def search(self, query: str, limit: int | None = None) -> SearchResult:
        return SearchResult(self.search_many([query], limit)[0])

    def aggregate(self, query, aggs: dict) -> dict:
        """Leaf/root distributed aggregation: each leaf computes the
        intermediate state over its doc range, the root merges the
        (associative) partials and finalizes once — the reference's
        per-split ``IntermediateAggregationResults`` merge."""
        import pickle

        import ray
        from tantivy4java_ray.aggs import finalize, merge_states
        qb = pickle.dumps(query)
        sb = pickle.dumps(aggs)
        blobs = ray.get([a.aggregate_partial.remote(qb, sb)
                         for a in self._actors])
        merged: dict = {}
        for b in blobs:
            merged = merge_states(aggs, merged, pickle.loads(b))
        return finalize(aggs, merged)

    def warmup(self, query: str) -> list[dict]:
        """warmupQuery across the leaves: each leaf prefetches only the
        pages ``query`` touches within ITS doc range."""
        import ray
        return ray.get([a.warmup.remote(query) for a in self._actors])

    def shutdown(self) -> None:
        import ray
        for a in self._actors:
            ray.kill(a)
        self._actors = []


def batch_search(index_dir: str, queries: list[str], limit: int = 10,
                 concurrency: int | None = None, method: str = "auto"):
    """Execute many queries as a Dataset pipeline (QPS path)."""
    import ray.data
    items = [{"query_id": i, "query": q} for i, q in enumerate(queries)]
    conc = concurrency or 4
    return ray.data.from_items(items).map_batches(
        QueryExecutor,
        fn_constructor_kwargs=dict(index_dir=index_dir, limit=limit,
                                   method=method),
        batch_format="pyarrow", concurrency=(1, conc), num_cpus=1)
