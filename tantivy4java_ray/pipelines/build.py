"""Distributed index build: the Ray-Data-first retelling of the reference's
``IndexWriter`` + ``QuickwitSplit.convertIndex`` pipeline (SURVEY.md §3.1).

Dataflow::

    plan_partitions(parquet footers)                      # driver, metadata only
      -> ray.data.from_items(partition specs)
      -> map_batches(_index_partition_task, task pool     # tokenize + combine
           with per-worker indexer cache)                 #   (the combiner)
           emits per-(term, partition) PARTIAL postings:
             hot terms (df >= FRAG_MIN_DF) pre-encoded to
             FINAL block-128 format (.enc.parquet, raw)   #   map-side encode
             rare terms delta-encoded + zstd-1            #   shuffle bytes
           writes docdata/part-{pid}.parquet              #   fieldnorms + fast fields
      -> external shuffle BY SHARD (map writes per-shard
         partial files; reduce reads exactly its slice)   # the one exchange
      -> one reduce task per shard                        # sorted term dict +
           byte-copies hot fragments as posting RUNS,     #   zero re-encode
           merges + encodes rare-term tails, streams to
           shards/shard-{sid}/{terms.parquet,
                  postings.bin, positions.bin}
    driver: txlog versions + checkpoint manifest          # lineage + resume

Scale/skew notes (explicitly, per BASELINE.json north rule):

- The per-partition partial posting is the *combiner*: a head (Zipfian) term
  contributes at most ONE row per build partition to the shuffle, never one
  row per document, so ``groupby(shard)`` traffic is bounded by
  ``vocab x partitions`` regardless of term frequency skew. Shard keys are a
  deterministic hash of ``(field, term)``, so shard sizes are uniform.
- Partials arrive doc-range-disjoint and doc-sorted; the shard writer's
  "merge" is an ordered concat (the degenerate merge-heap), then re-encoded
  into delta/bitpacked blocks.
- Posting doc ids are stored per-RUN relative to an int64 ``run_base`` with
  u32 offsets, so the format addresses >2^32 documents (10^12-doc target)
  while blocks stay 4-byte packed.
- DocIDs are a prefix sum over parquet footers — deterministic under retry
  and resume (never Ray block order).
- Resume: every partition's outputs (docdata + partial checkpoint) are
  written atomically to deterministic paths; a re-run skips finished
  partitions and the txlog records per-partition lineage + metrics.

The wide ``html`` column is projected away at the read: only schema fields
flow through tokenization, and only *partial postings* (no raw text) enter
the shuffle.
"""

from __future__ import annotations

import io
import json
import os
import time
from dataclasses import dataclass
from typing import Any, Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tantivy4java_ray.analyzer import get_analyzer, tokenize_column
from tantivy4java_ray.fieldnorm import fieldnorm_to_id
from tantivy4java_ray import postings as pcodec
from tantivy4java_ray.postings import encode_positions, encode_postings
from tantivy4java_ray.schema import FieldType, IndexSchema, infer_index_schema
from tantivy4java_ray.sources.parquet_meta import plan_partitions
from tantivy4java_ray.stages.extract import fill_text_from_html
from tantivy4java_ray.state.manifest import TransactionLog, atomic_write_json

RUN_SPAN = 1 << 32  # max doc span addressable by one posting run (u32)

#: inter-value position gap for MULTI-VALUED text fields (tantivy's
#: segment writer advances the position counter between consecutive
#: values of one document so a phrase can never match across a value
#: boundary; tantivy pins this gap at 2 — slop<=1 phrases are blocked,
#: larger slops can intentionally bridge values, matching upstream)
MULTIVALUE_POSITION_GAP = 2

#: partial-format completion marker: versioned so a build resumed across
#: code versions re-maps partitions instead of mixing delta/absolute
#: partial encodings (v2 = delta-encoded docs/positions; v3 = + map-side
#: pre-encoded hot-term fragments in .enc.parquet files)
_PARTIAL_MARKER = ".complete-v3"

#: map-side fragment pre-encoding: a term whose df WITHIN one partition
#: reaches this bound gets its posting fragment encoded to final
#: block-128 format on the MAP side and byte-copied as an independent
#: run by the reduce. Hot terms dominate posting BYTES (Zipf), so this
#: moves the byte-heavy bitpacking into the embarrassingly-parallel map
#: phase; the reduce re-encodes only rare-term tails. 0 disables.
FRAG_MIN_DF = int(os.environ.get("T4JR_FRAG_DF", "256"))

_PARTIAL_SCHEMA = pa.schema([
    ("shard", pa.int32()),
    ("field", pa.string()),
    ("term", pa.string()),
    ("pid", pa.int32()),
    ("doc_base", pa.int64()),
    ("df", pa.int64()),
    ("ttf", pa.int64()),
    ("docs", pa.large_binary()),
    ("tfs", pa.large_binary()),
    ("positions", pa.large_binary()),
    ("nids", pa.large_binary()),   # u8 fieldnorm id per pair (or empty):
                                   # lets the reduce emit block-max
                                   # frontiers for reduce-encoded runs
])

#: pre-encoded hot-term fragments (one FINAL-format posting run per
#: (term, partition)); the reduce appends the blob bytes verbatim
_ENC_SCHEMA = pa.schema([
    ("shard", pa.int32()),
    ("field", pa.string()),
    ("term", pa.string()),
    ("run_base", pa.int64()),   # global doc id of the fragment's first doc
    ("df", pa.int64()),
    ("ttf", pa.int64()),
    ("postings", pa.large_binary()),   # encode_postings(docs - first, tfs)
    ("positions", pa.large_binary()),  # encode_positions(...) or b""
    ("blockmax", pa.large_binary()),   # block_frontier_blob(...) or b""
])


def field_may_contain_nul(schema: IndexSchema, field: str) -> bool:
    return schema.get_field(field).type is not FieldType.TEXT


class _CountingWriter:
    """Minimal ``.write``/``.tell`` shim over a streaming file handle —
    the shard writer tracks offsets itself so remote (fsspec) streams
    need not support ``tell``."""

    __slots__ = ("f", "n")

    def __init__(self, f):
        self.f = f
        self.n = 0

    def write(self, b) -> None:
        self.f.write(b)
        self.n += len(b)

    def tell(self) -> int:
        return self.n


def _write_sharded(table: pa.Table, partial_dir: str, name_fmt: str,
                   **pq_kwargs: Any) -> None:
    """Write one partial table split BY SHARD (the map output of the
    storage-backed shuffle: each reduce task later reads exactly its
    slice straight from storage, no object-store all-to-all)."""
    from tantivy4java_ray import storage as st
    shard_col = np.asarray(table.column("shard")
                           .to_numpy(zero_copy_only=False), np.int32)
    order = np.argsort(shard_col, kind="stable")
    sorted_p = table.take(pa.array(order))
    sc = shard_col[order]
    bounds = np.flatnonzero(np.diff(sc)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(sc)]))
    if not pq_kwargs:
        pq_kwargs = {"compression": "zstd", "compression_level": 1}
    for s0, s1 in zip(starts, ends):
        if s1 <= s0:
            continue
        sid = int(sc[s0])
        st.write_parquet_atomic(
            sorted_p.slice(s0, s1 - s0),
            st.sjoin(partial_dir, name_fmt.format(sid=sid)), **pq_kwargs)


def term_shard(field: str, terms: np.ndarray, num_shards: int) -> np.ndarray:
    """Deterministic shard of each term (stable across processes — pandas
    siphash with a fixed key, NOT Python ``hash``).

    NOTE: the hash separator is \\x1f, not \\x00 — pandas' siphash treats
    values as C strings and truncates at NUL (verified), which would
    collapse every term of a field into one shard."""
    keys = np.array([f"{field}\x1f{t}" for t in terms], dtype=object)
    return (pd.util.hash_array(keys) % np.uint64(num_shards)).astype(np.int32)


def term_shard_salted(field: str, terms: np.ndarray, salt: int,
                      num_shards: int) -> np.ndarray:
    """Shard for HOT terms: the salt spreads one term's partial postings
    across shards (per-partition), bounding any single reduce task's share
    of a stopword's postings — the north rule's 'salted repartitioning of
    hot postings'. Readers probe every salt candidate and merge runs by
    ``run_base`` (the merge-heap concat)."""
    keys = np.array([f"{field}\x1f{t}\x1f#s{salt}" for t in terms],
                    dtype=object)
    return (pd.util.hash_array(keys) % np.uint64(num_shards)).astype(np.int32)


def _flatten_json_terms(col: pa.Array, expand_dots: bool = True
                        ) -> tuple[np.ndarray, np.ndarray]:
    """JSON string column -> (row_idx, term) pairs, dot-expanded subpaths
    (``core/JsonObjectOptions.java`` semantics). Every leaf emits a
    ``path\\x01<str>`` term (exact match); numeric leaves ALSO emit a
    ``path\\x02<f64 order-preserving hex>`` term so range queries compare
    numerically, mirroring the reference's typed subpath discovery
    (``native/src/quickwit_split/json_discovery.rs``,
    ``native/src/query/json_query.rs``).

    NOTE — this is the COMPAT path: schema-less JSON strings force a
    per-row ``json.loads`` + Python walk, inherent to the format. Store
    JSON as Arrow STRUCT columns (parquet nested types) to take the
    vectorized ``_flatten_struct_terms`` path instead: one type-tree walk,
    whole child arrays per leaf, no per-row Python."""
    from tantivy4java_ray.pipelines.search import encode_f64_sortable
    rows: list[int] = []
    terms: list[str] = []

    def walk(prefix: str, val: Any, row: int) -> None:
        if isinstance(val, dict):
            for k, v in val.items():
                if not expand_dots:
                    k = k.replace(".", "\\.")
                walk(f"{prefix}.{k}" if prefix else k, v, row)
        elif isinstance(val, list):
            for v in val:
                walk(prefix, v, row)
        elif val is not None:
            sval = val if isinstance(val, str) else json.dumps(val)
            rows.append(row)
            terms.append(f"{prefix}\x01{sval}")
            if isinstance(val, (int, float)) and not isinstance(val, bool):
                rows.append(row)
                terms.append(
                    f"{prefix}\x02{encode_f64_sortable(float(val))}")

    for i, s in enumerate(col.to_pylist()):
        if not s:
            continue
        try:
            walk("", json.loads(s) if isinstance(s, str) else s, i)
        except (json.JSONDecodeError, TypeError):
            continue
    return (np.asarray(rows, np.int64), np.asarray(terms, dtype=object))


def _flatten_struct_terms(col: pa.Array, expand_dots: bool = True
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Arrow STRUCT-typed JSON column -> (row_idx, term) pairs with no
    per-row ``json.loads``: the type tree is walked once and every leaf
    is processed as a whole child array (vectorized) — the scale path
    for JSON-heavy tables where the per-row walk dominates the build.
    Term strings are identical to ``_flatten_json_terms`` over the
    equivalent JSON text (pinned by tests)."""
    import pyarrow.compute as pc

    from tantivy4java_ray.pipelines.search import encode_f64_sortable_array
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out_rows: list[np.ndarray] = []
    out_terms: list[np.ndarray] = []

    def _np_valid(arr: pa.Array, valid: np.ndarray) -> np.ndarray:
        nulls = np.asarray(arr.is_null().to_numpy(zero_copy_only=False))
        return valid & ~nulls

    def walk(prefix: str, arr: pa.Array, row_map: np.ndarray,
             valid: np.ndarray) -> None:
        t = arr.type
        if pa.types.is_struct(t):
            v = _np_valid(arr, valid)
            for i, f in enumerate(t):
                name = (f.name if expand_dots
                        else f.name.replace(".", "\\."))
                walk(f"{prefix}.{name}" if prefix else name,
                     arr.field(i), row_map, v)
            return
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            v = _np_valid(arr, valid)
            off = np.asarray(arr.offsets.to_numpy(zero_copy_only=False),
                             np.int64)
            starts = off[:-1]
            lens = np.where(v, off[1:] - starts, 0)
            total = int(lens.sum())
            if not total:
                return
            base = np.repeat(np.cumsum(lens) - lens, lens)
            idx = np.repeat(starts, lens) + (np.arange(total) - base)
            child = arr.values.take(pa.array(idx))
            walk(prefix, child, np.repeat(row_map, lens),
                 np.ones(total, bool))
            return
        mask = _np_valid(arr, valid)
        if not mask.any():
            return
        rm = row_map[mask]
        pref = prefix + "\x01"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            sub = arr.filter(pa.array(mask))
            terms = pc.binary_join_element_wise(
                pa.array(np.full(len(rm), pref, object)),
                pc.cast(sub, pa.string()), "")
            out_rows.append(rm)
            out_terms.append(np.asarray(
                terms.to_numpy(zero_copy_only=False), object))
            return
        if pa.types.is_boolean(t):
            # filter FIRST: to_numpy on a null-carrying array promotes
            # the dtype (int64 -> float64, bool -> object) and would
            # change the term strings ('3' -> '3.0')
            vals = np.asarray(arr.filter(pa.array(mask)).to_numpy(
                zero_copy_only=False))
            out_rows.append(rm)
            out_terms.append(np.where(vals.astype(bool),
                                      pref + "true",
                                      pref + "false").astype(object))
            return
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            vals = np.asarray(arr.filter(pa.array(mask)).to_numpy(
                zero_copy_only=False))
            # numpy str() matches json.dumps for ints and floats
            out_rows.append(rm)
            out_terms.append(
                np.char.add(pref, vals.astype(str)).astype(object))
            npref = prefix + "\x02"
            out_rows.append(rm)
            out_terms.append(np.char.add(
                npref, encode_f64_sortable_array(
                    vals.astype(np.float64)).astype("U16")).astype(object))
            return
        # anything else (timestamps, binary, ...): stringify via Arrow
        sub = arr.filter(pa.array(mask))
        try:
            svals = pc.cast(sub, pa.string())
        except pa.ArrowNotImplementedError:
            return
        terms = pc.binary_join_element_wise(
            pa.array(np.full(len(rm), pref, object)), svals, "")
        out_rows.append(rm)
        out_terms.append(np.asarray(
            terms.to_numpy(zero_copy_only=False), object))

    n = len(col)
    walk("", col, np.arange(n, dtype=np.int64), np.ones(n, bool))
    if not out_rows:
        return np.empty(0, np.int64), np.empty(0, object)
    rows = np.concatenate(out_rows)
    terms = np.concatenate(out_terms)
    order = np.argsort(rows, kind="stable")
    return rows[order], terms[order]


def _config_fp(schema_dict: dict, num_shards: int, exact_fieldnorms: bool,
               html_fallback, column_renames, phash_fields,
               hot_salts: int = 4) -> str:
    """Build-config fingerprint stamped into each partition's
    build_meta: a checkpoint skip is only valid when the existing
    output was produced by the SAME schema/shards/config (a plan or
    config change reassigns content; a stale skip would mix
    incompatible partials/doc-id spaces into one index). hot_salts is
    placement-affecting: a partial built with MORE salts parks hot-term
    runs under salt ids the new config's readers never probe."""
    import hashlib
    return hashlib.sha1(json.dumps(
        {"schema": schema_dict, "num_shards": num_shards,
         "exact_fieldnorms": exact_fieldnorms,
         "html_fallback": list(html_fallback) if html_fallback else None,
         "renames": column_renames or {},
         "phash_fields": sorted(phash_fields),
         "hot_salts": hot_salts,
         # bumped when partial/shard file formats change: a resume must
         # not byte-copy pre-frontier partials into a post-frontier index
         "pfmt": 3},
        sort_keys=True).encode()).hexdigest()


class PartitionIndexer:
    """Actor-pool stage: one call indexes one build partition.

    Analyzers are resolved once per actor in ``__init__`` (the reference's
    per-writer setup, ``core/IndexWriter.java:48``); each ``__call__``
    tokenizes a whole partition with vectorized kernels and emits partial
    postings + writes the partition's docdata file.
    """

    def __init__(self, schema_dict: dict, index_dir: str, num_shards: int,
                 html_fallback: tuple[str, str] | None = None,
                 exact_fieldnorms: bool = False, checkpoint: bool = True,
                 hot_salts: int = 4, hot_df_frac: float = 0.05,
                 column_renames: dict[str, str] | None = None,
                 phash_fields: tuple[str, ...] = (),
                 frag_min_df: int | None = None):
        self.schema = IndexSchema.from_dict(schema_dict)
        self.index_dir = index_dir
        self.num_shards = num_shards
        self.config_fp = _config_fp(schema_dict, num_shards,
                                    exact_fieldnorms, html_fallback,
                                    column_renames, phash_fields,
                                    hot_salts)
        self.html_fallback = html_fallback
        self.exact_fieldnorms = exact_fieldnorms
        self.checkpoint = checkpoint
        self.hot_salts = hot_salts
        self.hot_df_frac = hot_df_frac
        # parquet column name -> display name (Iceberg-style name mapping;
        # parquet_companion/name_mapping.rs analog)
        self.renames = column_renames or {}
        self.inv_renames = {v: k for k, v in self.renames.items()}
        self.phash_fields = tuple(phash_fields)
        self.frag_min_df = (FRAG_MIN_DF if frag_min_df is None
                            else frag_min_df)
        self.analyzers = {f.name: get_analyzer(f.tokenizer)
                          for f in self.schema.fields
                          if f.type is FieldType.TEXT}
        cols = {f.name for f in self.schema.fields}
        if html_fallback:
            cols.add(html_fallback[1])
        # phash fields need not be schema fields — they still must be
        # READ (the pruned column list would otherwise exclude them and
        # tbl.column() would fail on every partition)
        cols.update(self.phash_fields)
        self.columns = sorted(self.inv_renames.get(c, c) for c in cols)

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        for spec in batch.to_pylist():
            yield self._index_partition(spec)


    # ------------------------------------------------------------------
    def _tokenize_multivalue(self, col: pa.Array, n: int,
                             html_col, field: str):
        """Tokenize a ``list<string>`` text column value-by-value ->
        ``(rows, codes, vocab, positions, row_token_counts)`` in the
        per-DOC frame, with positions continuing across a document's
        values separated by ``MULTIVALUE_POSITION_GAP``. Docs whose
        whole list is null take the html fallback extraction as their
        single value (same rule as the scalar path's null fill); doc
        length (fieldnorm) counts tokens only — gaps are positions,
        not tokens."""
        import pyarrow.compute as pc
        flat = pc.list_flatten(col)              # non-null rows' values
        parents = np.asarray(pc.list_parent_indices(col)
                             .to_numpy(zero_copy_only=False), np.int64)
        if html_col is not None:
            # fallback when the list is null OR any ELEMENT is null —
            # the scalar path's join produced a null joined string for
            # both, and the doc fell back to the html extraction
            null_mask = np.asarray(
                col.is_null().to_numpy(zero_copy_only=False), bool)
            if len(flat):
                enull = np.asarray(
                    flat.is_null().to_numpy(zero_copy_only=False), bool)
                if enull.any():
                    null_mask[np.unique(parents[enull])] = True
                    keep = ~null_mask[parents]
                    flat = flat.filter(pa.array(keep))
                    parents = parents[keep]
            null_docs = np.flatnonzero(null_mask).astype(np.int64)
            if len(null_docs):
                probe = np.full(n, "", object)
                probe[null_docs] = None
                filled = fill_text_from_html(
                    pa.array(probe, pa.string()), html_col)
                fb_vals = filled.take(pa.array(null_docs))
                flat = pa.concat_arrays([flat.cast(pa.string()),
                                         fb_vals])
                parents = np.concatenate([parents, null_docs])
                order = np.argsort(parents, kind="stable")
                flat = flat.take(pa.array(order))
                parents = parents[order]
        tok = tokenize_column(flat, self.analyzers[field],
                              include_tokens=False)
        vcounts = tok["row_token_counts"]        # tokens per VALUE
        # per-value position base inside its doc: exclusive running sum
        # of (tokens + GAP) over the doc's earlier values
        adv = vcounts + MULTIVALUE_POSITION_GAP
        run = np.cumsum(adv) - adv               # global exclusive cumsum
        first = np.ones(len(parents), bool)
        if len(parents) > 1:
            np.not_equal(parents[1:], parents[:-1], out=first[1:])
        doc_first = np.cumsum(first) - 1         # index of doc's 1st value
        base = run - run[np.flatnonzero(first)][doc_first]
        rows = parents[tok["row"]]
        positions = (tok["position"]
                     + base[tok["row"]]).astype(np.int32)
        counts = np.bincount(parents, weights=vcounts,
                             minlength=n).astype(np.int64)
        return rows, tok["codes"], tok["vocab"], positions, counts

    def _paths(self, pid: int) -> tuple[str, str]:
        from tantivy4java_ray import storage as st
        return (st.sjoin(self.index_dir, "docdata", f"part-{pid:05d}.parquet"),
                st.sjoin(self.index_dir, "_partials", f"part-{pid:05d}"))

    def _index_partition(self, spec: dict) -> pa.Table:
        from tantivy4java_ray import storage as st
        pid = spec["pid"]
        docdata_path, partial_dir = self._paths(pid)
        summary = pa.table({"pid": pa.array([pid], pa.int32()),
                            "resumed": pa.array([False])})
        if (self.checkpoint and st.sexists(docdata_path)
                and st.sexists(st.sjoin(partial_dir, _PARTIAL_MARKER))):
            # resume ONLY when the existing output was built from the
            # same source spec AND build config: a re-planned input
            # (added file, different partition size) or changed
            # schema/shards reassigns doc_bases and shard layouts, and
            # skipping on pid alone would silently mix doc-id spaces
            try:
                old = json.loads(
                    st.read_parquet_metadata_any(docdata_path)
                    .metadata[b"build_meta"].decode())
            except (KeyError, ValueError, OSError):
                old = None
            if (old is not None
                    and old.get("path") == spec["path"]
                    and old.get("row_groups") == spec["row_groups"]
                    and old.get("doc_base") == spec["doc_base"]
                    and old.get("config_fp") == self.config_fp):
                return pa.table({"pid": pa.array([pid], pa.int32()),
                                 "resumed": pa.array([True])})
        if st.sexists(partial_dir):
            # (re)mapping: purge any prior attempt's partials first. A
            # crashed or older-format attempt may have left atomic
            # shard-*.parquet / .enc.parquet files (no marker, or a
            # stale-version marker); mixing them with this attempt's
            # output would double-append postings in the reduce.
            st.srmtree(partial_dir)

        t0 = time.monotonic()
        pf = st.parquet_file_any(spec["path"])
        avail = set(pf.schema_arrow.names)
        cols = [c for c in self.columns if c in avail]
        tbl = pf.read_row_groups(spec["row_groups"], columns=cols)
        if self.renames:
            tbl = tbl.rename_columns(
                [self.renames.get(c, c) for c in tbl.column_names])
            avail = set(tbl.column_names)
        n = tbl.num_rows

        acc: list[pa.Table] = []   # one table per indexed field
        enc_acc: list[pa.Table] = []  # pre-encoded hot-term fragments
        docdata_cols: dict[str, pa.Array] = {}
        total_tokens: dict[str, int] = {}
        n_postings = 0

        for fcfg in self.schema.fields:
            if fcfg.name not in avail and fcfg.type is not FieldType.TEXT:
                continue
            col = (tbl.column(fcfg.name).combine_chunks()
                   if fcfg.name in avail else None)
            if fcfg.type is FieldType.TEXT:
                if col is None:
                    if (self.html_fallback
                            and fcfg.name == self.html_fallback[0]
                            and self.html_fallback[1] in avail):
                        # text column wholly absent from this file but the
                        # html source exists: synthesize an all-null text
                        # column so the fallback extraction below fills
                        # EVERY row (otherwise these docs are silently
                        # unsearchable)
                        col = pa.nulls(n, pa.string())
                    else:
                        continue
                html_col = (tbl.column(self.html_fallback[1])
                            .combine_chunks()
                            if self.html_fallback
                            and fcfg.name == self.html_fallback[0]
                            and self.html_fallback[1] in avail else None)
                if pa.types.is_list(col.type) or \
                        pa.types.is_large_list(col.type):
                    # multi-valued text (Document.addText called N times,
                    # core/Document.java:80-106): tokenize each VALUE,
                    # then continue positions per doc with the
                    # inter-value gap so phrases never match across
                    # value boundaries (tantivy segment-writer
                    # semantics; the old join-with-'\n' ran positions
                    # contiguously)
                    rows, codes, vocab, positions, counts = \
                        self._tokenize_multivalue(col, n, html_col,
                                                  fcfg.name)
                else:
                    if html_col is not None:
                        col = fill_text_from_html(col, html_col)
                    tok = tokenize_column(col, self.analyzers[fcfg.name],
                                          include_tokens=False)
                    rows, codes, vocab = (tok["row"], tok["codes"],
                                          tok["vocab"])
                    positions = tok["position"]
                    counts = tok["row_token_counts"]
                total_tokens[fcfg.name] = int(counts.sum())
                nid_arr = (fieldnorm_to_id(counts)
                           if fcfg.fieldnorms else None)
                if fcfg.fieldnorms:
                    docdata_cols[f"norm__{fcfg.name}"] = pa.array(
                        nid_arr, pa.uint8())
                    if self.exact_fieldnorms:
                        docdata_cols[f"dl__{fcfg.name}"] = pa.array(
                            counts.astype(np.uint32), pa.uint32())
                if fcfg.indexed:
                    with_pos = fcfg.index_option == "position"
                    n_postings += self._emit_terms(
                        acc, enc_acc, fcfg.name, spec, rows,
                        codes, vocab,
                        positions if with_pos else None, n,
                        nids=nid_arr)
            elif fcfg.type in (FieldType.STRING, FieldType.FACET,
                               FieldType.IP_ADDR):
                if col is None:
                    continue
                term_col = col
                if fcfg.type is FieldType.IP_ADDR:
                    # dictionary terms: fixed-width 32-hex u128 so the
                    # term-range window compares numerically
                    # (ip_expansion.rs / SplitRangeQuery.java:12-78);
                    # fast/stored column keeps the pretty canonical form
                    from tantivy4java_ray.functions.scalars import (
                        ip_term, normalize_ip)
                    raw = col.cast(pa.string()).to_pylist()
                    term_col = pa.array(
                        [None if v is None else ip_term(v) for v in raw],
                        pa.string())
                    col = pa.array(
                        [None if v is None else normalize_ip(v) for v in raw],
                        pa.string())
                if fcfg.indexed:
                    if fcfg.type is FieldType.FACET:
                        # index every ancestor path so prefix queries and
                        # per-level facet counts are dictionary lookups
                        from tantivy4java_ray.functions.scalars import (
                            facet_ancestors)
                        frows: list[int] = []
                        fterms: list[str] = []
                        for i, v in enumerate(col.cast(pa.string()).to_pylist()):
                            if v:
                                for anc in facet_ancestors(v):
                                    frows.append(i)
                                    fterms.append(anc)
                        if frows:
                            fcodes, funiq = pd.factorize(
                                np.asarray(fterms, object), sort=False)
                            n_postings += self._emit_terms(
                                acc, enc_acc, fcfg.name, spec,
                                np.asarray(frows, np.int64),
                                fcodes.astype(np.int64),
                                np.asarray(funiq, object), None, n)
                    else:
                        tok = tokenize_column(term_col, get_analyzer("raw"),
                                              include_tokens=False)
                        n_postings += self._emit_terms(
                            acc, enc_acc, fcfg.name, spec, tok["row"],
                            tok["codes"], tok["vocab"], None, n)
                if fcfg.fast:
                    docdata_cols[fcfg.name] = col.cast(pa.string())
            elif fcfg.type is FieldType.JSON:
                if col is None or not fcfg.indexed:
                    continue
                if pa.types.is_struct(col.type):
                    # struct-typed JSON (parquet nested columns): the
                    # vectorized type-tree walk, no per-row json.loads
                    rows, terms = _flatten_struct_terms(col)
                else:
                    rows, terms = _flatten_json_terms(
                        col.cast(pa.string()))
                if len(rows):
                    jcodes, juniq = pd.factorize(terms, sort=False)
                    n_postings += self._emit_terms(
                        acc, enc_acc, fcfg.name, spec, rows,
                        jcodes.astype(np.int64), np.asarray(juniq, object),
                        None, n)
            else:  # numeric / date / bool / bytes -> fast columns only
                if col is not None and fcfg.fast:
                    docdata_cols[fcfg.name] = col

        partial = (pa.concat_tables(acc) if acc
                   else _PARTIAL_SCHEMA.empty_table())

        # docdata: fieldnorms + fast fields, one file per partition, with
        # build lineage + metrics in the parquet footer (txlog-visible)
        # stored fields: copied into docdata so retrieval works without the
        # source parquet (the reference's STORE component; companion mode
        # keeps this empty by leaving stored=False — indexing.rs:210)
        for fcfg in self.schema.fields:
            if fcfg.stored and fcfg.name in avail:
                docdata_cols[f"stored__{fcfg.name}"] = (
                    tbl.column(fcfg.name).combine_chunks())

        # hidden _phash_<field> u64 fingerprints (indexing.rs:57-78 analog:
        # cheap distinct/terms without the string column)
        for pf_name in self.phash_fields:
            if pf_name in avail:
                from tantivy4java_ray.functions.scalars import (
                    string_fingerprint)
                vals = tbl.column(pf_name).to_numpy(zero_copy_only=False)
                docdata_cols[f"_phash_{pf_name}"] = pa.array(
                    string_fingerprint(vals), pa.uint64())

        # per-partition fast-field min/max: enables query-time predicate
        # pruning of partitions (async_impl.rs:16-46 analog)
        col_stats: dict[str, list] = {}
        for name, arr in docdata_cols.items():
            try:
                import pyarrow.compute as pc
                mm = pc.min_max(arr)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if hasattr(lo, "isoformat"):
                    lo, hi = str(np.datetime64(lo, "us")), str(
                        np.datetime64(hi, "us"))
                col_stats[name] = [lo, hi]
            except (pa.ArrowNotImplementedError, TypeError):
                continue
        meta = {"pid": pid, "doc_base": spec["doc_base"], "num_docs": n,
                "path": spec["path"], "row_groups": spec["row_groups"],
                "config_fp": self.config_fp,
                "total_tokens": total_tokens,
                "col_stats": col_stats,
                "metrics": {"build_s": round(time.monotonic() - t0, 4),
                            "n_postings": n_postings,
                            "n_partial_terms": partial.num_rows}}
        dd = pa.table(docdata_cols) if docdata_cols else pa.table(
            {"__rows__": pa.nulls(n, pa.int8())})
        dd = dd.replace_schema_metadata({"build_meta": json.dumps(meta)})
        # partials are the map-side shuffle output: one file PER SHARD so
        # each shard writer reads exactly its slice straight from storage
        # — no object-store all-to-all of index-sized blobs (the classic
        # external shuffle; on a cluster the shared store scales with
        # nodes while a sort exchange saturates the network bisection)
        # zstd-1 halves partial bytes vs snappy (position streams are
        # raw u32 here) at ~no CPU cost — partials are written once,
        # read once, and dominate the build's storage traffic
        _write_sharded(partial, partial_dir, "shard-{sid:05d}.parquet")
        if enc_acc:
            # pre-encoded fragments are bitpacked (zstd gains little);
            # store uncompressed so both ends skip the codec pass
            _write_sharded(pa.concat_tables(enc_acc), partial_dir,
                           "shard-{sid:05d}.enc.parquet",
                           compression="none")
        st.write_bytes_atomic(b"", st.sjoin(partial_dir, _PARTIAL_MARKER))
        self._atomic_parquet(dd, docdata_path)
        return summary

    @staticmethod
    def _atomic_parquet(table: pa.Table, path: str) -> None:
        from tantivy4java_ray.storage import write_parquet_atomic
        write_parquet_atomic(table, path)

    def _emit_terms(self, acc: list, enc_acc: list, field: str, spec: dict,
                    rows: np.ndarray, codes: np.ndarray, vocab: np.ndarray,
                    positions: np.ndarray | None, n_rows: int,
                    nids: np.ndarray | None = None) -> int:
        """Aggregate dictionary-encoded (token, row) pairs into per-term
        partial postings. Vectorized: one stable argsort over int64 keys;
        Python touches only the partition's vocabulary, never its tokens."""
        if len(rows) == 0:
            return 0
        if field_may_contain_nul(self.schema, field):
            # pandas hash truncates object strings at NUL; terms from
            # raw/keyword fields may embed \x00 -> sanitize the vocab.
            # (Analyzer output never contains NUL: it is a split character.)
            if any("\x00" in t for t in vocab):
                vocab = np.array([t.replace("\x00", "�") for t in vocab],
                                 dtype=object)
        # token emission is row-major, so rows are nondecreasing and a
        # stable sort on codes ALONE yields (code, row) order — int32
        # radix needs half the passes of the int64 composite key (~30%
        # faster, measured) and skips building the key entirely
        if len(rows) > 1 and np.all(rows[1:] >= rows[:-1]):
            order = np.argsort(codes.astype(np.int32), kind="stable")
        else:  # generic callers (e.g. unsorted row sets): composite key
            key = codes.astype(np.int64) * np.int64(n_rows) + rows
            order = np.argsort(key, kind="stable")
        codes_s = codes[order]
        rows_s = rows[order]
        new_pair = np.empty(len(order), bool)
        new_pair[0] = True
        np.not_equal(codes_s[1:], codes_s[:-1], out=new_pair[1:])
        np.logical_or(new_pair[1:], rows_s[1:] != rows_s[:-1],
                      out=new_pair[1:])
        pstarts = np.flatnonzero(new_pair)
        tf = np.diff(np.append(pstarts, len(order))).astype(np.uint32)
        pair_code = codes_s[pstarts]
        pair_row = rows_s[pstarts].astype(np.uint32)
        nid_pairs = (np.asarray(nids, np.uint8)[pair_row]
                     if nids is not None else None)
        pos_sorted = positions[order].astype(np.uint32) if positions is not None else None
        pair_pos_off = np.concatenate(
            ([0], np.cumsum(tf, dtype=np.int64))).astype(np.int64)

        new_term = np.empty(len(pstarts), bool)
        new_term[0] = True
        np.not_equal(pair_code[1:], pair_code[:-1], out=new_term[1:])
        tstarts = np.flatnonzero(new_term)
        tlens = np.diff(np.append(tstarts, len(pstarts)))

        term_per_group = vocab[pair_code[tstarts]]
        shards = term_shard(field, term_per_group, self.num_shards)
        # head-term skew: terms hot in THIS partition (partial df above a
        # fraction of its docs) are salted by pid so their postings spread
        # across up to hot_salts reduce tasks; purely local decision, no
        # coordination — readers probe all salt candidates
        if self.hot_salts > 1 and self.num_shards > 1:
            hot = tlens >= max(64, int(self.hot_df_frac * n_rows))
            if hot.any():
                shards[hot] = term_shard_salted(
                    field, term_per_group[hot],
                    spec["pid"] % self.hot_salts, self.num_shards)

        # whole-column construction: the per-term docs/tfs/positions are
        # contiguous slices of the pair-sorted arrays, so the binary
        # columns come straight from (offsets, data) buffers — no
        # per-term Python loop, no per-term bytes objects
        n_terms = len(tstarts)
        n_pairs = len(pstarts)
        ttf_arr = np.add.reduceat(tf.astype(np.int64), tstarts)

        # delta-encode docs within each term and positions within each
        # (term, doc) pair: partials dominate the build's storage traffic
        # (round-3 accounting: positions 64% + docs 28% of partial bytes)
        # and small deltas compress far better under zstd; the reduce
        # side restores absolutes with segmented cumsums
        docs_delta = pair_row.copy()
        if len(docs_delta) > 1:
            docs_delta[1:] = pair_row[1:] - pair_row[:-1]
        docs_delta[tstarts] = pair_row[tstarts]
        if pos_sorted is not None:
            pos_delta = pos_sorted.copy()
            if len(pos_delta) > 1:
                pos_delta[1:] = pos_sorted[1:] - pos_sorted[:-1]
            pos_delta[pstarts] = pos_sorted[pstarts]
        else:
            pos_delta = None

        # map-side fragment pre-encoding: hot terms (df within this
        # partition >= frag_min_df) are bitpacked to FINAL posting format
        # here, where the work parallelizes across all partitions; the
        # reduce appends each blob as an independent run (all query paths
        # treat a term's runs as disjoint posting lists). Hot terms carry
        # most posting bytes (Zipf), so the reduce's byte work collapses
        # to memcpy + rare-term tails.
        enc_mask = (tlens >= self.frag_min_df if self.frag_min_df
                    else np.zeros(n_terms, bool))
        if enc_mask.any():
            e_idx = np.flatnonzero(enc_mask)
            e_blobs: list[bytes] = []
            e_pblobs: list[bytes] = []
            e_bm: list[bytes] = []
            e_first = np.empty(len(e_idx), np.int64)
            for k, ti in enumerate(e_idx):
                p0 = int(tstarts[ti])
                p1 = p0 + int(tlens[ti])
                dloc = pair_row[p0:p1]
                e_first[k] = first = int(dloc[0])
                e_blobs.append(encode_postings(
                    dloc - np.uint32(first), tf[p0:p1]))
                e_pblobs.append(
                    encode_positions(
                        pos_sorted[pair_pos_off[p0]:pair_pos_off[p1]])
                    if pos_sorted is not None else b"")
                # per-block (tf, fieldnorm) Pareto frontier: the block-max
                # metadata the pruned top-k path needs; computed here where
                # the work parallelizes across partitions and the doc->norm
                # mapping is at hand (parameter-free, survives merges)
                e_bm.append(pcodec.block_frontier_blob(tf[p0:p1],
                                                       nids[dloc])
                            if nids is not None else b"")
            enc_acc.append(pa.table({
                "shard": pa.array(shards[e_idx], pa.int32()),
                "field": pa.array([field] * len(e_idx), pa.string()),
                "term": pa.array(term_per_group[e_idx], pa.string()),
                "run_base": pa.array(e_first + spec["doc_base"]),
                "df": pa.array(tlens[e_idx].astype(np.int64)),
                "ttf": pa.array(ttf_arr[e_idx]),
                "postings": pa.array(e_blobs, pa.large_binary()),
                "positions": pa.array(e_pblobs, pa.large_binary()),
                "blockmax": pa.array(e_bm, pa.large_binary())},
                schema=_ENC_SCHEMA))
            # drop fragment terms from the cold partial (delta streams
            # reset at term starts, so whole-term filtering keeps the
            # remaining encodings valid)
            cold = ~enc_mask
            pair_keep = np.repeat(cold, tlens)
            docs_delta = docs_delta[pair_keep]
            tf = tf[pair_keep]
            if nid_pairs is not None:
                nid_pairs = nid_pairs[pair_keep]
            if pos_delta is not None:
                pos_delta = pos_delta[np.repeat(cold, ttf_arr)]
            shards = shards[cold]
            term_per_group = term_per_group[cold]
            tlens = tlens[cold]
            ttf_arr = ttf_arr[cold]
            n_terms = len(tlens)

        term_bounds = np.concatenate(
            ([0], np.cumsum(tlens))).astype(np.int64)

        def bin_col(values_u32: np.ndarray, bounds: np.ndarray) -> pa.Array:
            offsets = (bounds * 4).astype(np.int64)
            data = np.ascontiguousarray(values_u32, np.uint32)
            return pa.LargeBinaryArray.from_buffers(
                pa.large_binary(), n_terms,
                [None, pa.py_buffer(offsets.tobytes()),
                 pa.py_buffer(data.tobytes())])

        if pos_delta is not None:
            pos_col = bin_col(pos_delta, np.concatenate(
                ([0], np.cumsum(ttf_arr))).astype(np.int64))
        else:
            pos_col = bin_col(np.empty(0, np.uint32),
                              np.zeros(n_terms + 1, np.int64))

        def u8_col(values: np.ndarray | None) -> pa.Array:
            if values is None:
                return pa.LargeBinaryArray.from_buffers(
                    pa.large_binary(), n_terms,
                    [None, pa.py_buffer(np.zeros(n_terms + 1,
                                                 np.int64).tobytes()),
                     pa.py_buffer(b"")])
            return pa.LargeBinaryArray.from_buffers(
                pa.large_binary(), n_terms,
                [None, pa.py_buffer(term_bounds.tobytes()),
                 pa.py_buffer(np.ascontiguousarray(values,
                                                   np.uint8).tobytes())])

        acc.append(pa.table({
            "shard": pa.array(shards, pa.int32()),
            "field": pa.array([field] * n_terms, pa.string()),
            "term": pa.array(term_per_group, pa.string()),
            "pid": pa.array(np.full(n_terms, spec["pid"], np.int32)),
            "doc_base": pa.array(
                np.full(n_terms, spec["doc_base"], np.int64)),
            "df": pa.array(tlens.astype(np.int64)),
            "ttf": pa.array(ttf_arr),
            "docs": bin_col(docs_delta, term_bounds),
            "tfs": bin_col(tf, term_bounds),
            "positions": pos_col,
            "nids": u8_col(nid_pairs)}))
        return int(n_pairs)


#: per-worker-process indexer cache: Ray reuses worker processes across
#: tasks, so analyzer/schema setup still happens once per worker (the
#: actor-pool property) while the stage schedules as plain tasks
_TASK_INDEXERS: dict[str, PartitionIndexer] = {}


def _index_partition_task(batch: pa.Table, kwargs: dict
                          ) -> Iterator[pa.Table]:
    key = json.dumps(kwargs, sort_keys=True, default=str)
    idxr = _TASK_INDEXERS.get(key)
    if idxr is None:
        _TASK_INDEXERS.clear()
        idxr = _TASK_INDEXERS[key] = PartitionIndexer(**kwargs)
    yield from idxr(batch)


# ---------------------------------------------------------------------------
# shard writer (the reduce side of the groupby(shard) shuffle)
# ---------------------------------------------------------------------------

def _binary_column_view(col: pa.ChunkedArray
                        ) -> tuple[np.ndarray, np.ndarray]:
    """(row byte-offsets int64[n+1], flat data uint8) of a large_binary
    column — zero-copy views into Arrow buffers, no per-row objects."""
    arr = col.combine_chunks()
    raw_off = np.frombuffer(arr.buffers()[1], np.int64,
                            len(arr) + 1 + arr.offset)
    off = raw_off[arr.offset:]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    return off, data


def _write_shard(group: pa.Table, index_dir: str,
                 enc: pa.Table | None = None) -> pa.Table:
    """Merge one shard's partial postings into final segment-shard files.

    Fully buffer-level: after the (field, term, doc_base) sort the rows
    of one term are CONTIGUOUS, so each term's merged docs/tfs/positions
    are single slices of the column data buffers — no per-row
    ``frombuffer``/concat (at web scale the merge loop touches each byte
    once; the per-term Python work is the encode call only).

    ``enc`` rows are map-side pre-encoded hot-term fragments: their blob
    bytes are appended VERBATIM as independent posting runs (no decode,
    no re-encode — the byte-dominant part of the reduce becomes memcpy),
    then the dictionary is key-sorted once at the end."""
    n_enc = enc.num_rows if enc is not None else 0
    if group.num_rows == 0 and n_enc == 0:
        return pa.table({"sid": pa.array([], pa.int32()),
                         "num_terms": pa.array([], pa.int64()),
                         "postings_bytes": pa.array([], pa.int64()),
                         "positions_bytes": pa.array([], pa.int64())})
    t0 = time.monotonic()
    sid = int((group if group.num_rows else enc).column("shard")[0].as_py())
    dict_rows: dict[str, list] = {k: [] for k in
                                  ("key", "field", "term", "run_base", "df",
                                   "ttf", "offset", "nbytes", "pos_offset",
                                   "pos_nbytes", "bm_offset", "bm_nbytes")}
    # postings/positions stream STRAIGHT to their (atomic) output files:
    # accumulating in BytesIO then getvalue() costs two extra full passes
    # over index-sized bytes, which is most of what a reduce task does
    from tantivy4java_ray import storage as st
    shard_dir = st.sjoin(index_dir, "shards", f"shard-{sid:05d}")
    with st.open_bytes_atomic(st.sjoin(shard_dir, "postings.bin")) as _pf, \
         st.open_bytes_atomic(st.sjoin(shard_dir, "positions.bin")) as _xf, \
         st.open_bytes_atomic(st.sjoin(shard_dir, "blockmax.bin")) as _bf:
        post_buf = _CountingWriter(_pf)
        pos_buf = _CountingWriter(_xf)
        bm_buf = _CountingWriter(_bf)

        if group.num_rows:
            # chained stable argsorts == lexsort by (field, term, doc_base).
            # NOT pandas sort_values: pandas compares object strings as C strings
            # and truncates at NUL bytes (verified), silently mis-sorting any term
            # containing \x00; numpy object argsort uses real Python comparison.
            fields_o = np.asarray(group.column("field").to_numpy(
                zero_copy_only=False), object)
            terms_o = np.asarray(group.column("term").to_numpy(
                zero_copy_only=False), object)
            bases_o = group.column("doc_base").to_numpy(zero_copy_only=False)
            order = np.argsort(bases_o, kind="stable")
            order = order[np.argsort(terms_o[order], kind="stable")]
            order = order[np.argsort(fields_o[order], kind="stable")]
            group = group.take(pa.array(order))
            fields_arr = fields_o[order]
            terms_arr = terms_o[order]
            bases_arr = bases_o[order].astype(np.int64)
            dfs_arr = group.column("df").to_numpy(zero_copy_only=False)

            # whole-column flat views (take materialized rows in sorted order,
            # so consecutive rows' bytes are contiguous)
            doc_off, doc_data = _binary_column_view(group.column("docs"))
            _, tf_data = _binary_column_view(group.column("tfs"))
            pos_off, pos_data = _binary_column_view(group.column("positions"))
            if "nids" in group.column_names:   # u8 fieldnorm id per pair
                nid_off, nid_data = _binary_column_view(
                    group.column("nids"))
            else:  # partials from a pre-frontier build (resume compat)
                nid_off = np.zeros(group.num_rows + 1, np.int64)
                nid_data = np.empty(0, np.uint8)

            def _u32(data: np.ndarray) -> np.ndarray:
                return data[:(len(data) // 4) * 4].view(np.uint32)

            # per-row pair/position offsets in VALUE units
            pair_off = (doc_off // 4).astype(np.int64)
            posv_off = (pos_off // 4).astype(np.int64)
            from tantivy4java_ray.nputil import repeat_int
            docs_all = _u32(doc_data)[:pair_off[-1]].astype(np.int64)
            # partials carry per-term doc DELTAS (map-side compression):
            # segmented cumsum restores absolute GLOBAL doc ids per partial row.
            # Allocation-frugal on purpose: this host (like many overcommitted
            # VMs) first-touches fresh anonymous pages at ~50 MB/s, so every
            # avoidable 100 MB temporary costs seconds per reduce task — cumsum
            # runs in place and doc_base folds into the single repeat
            if len(docs_all):
                np.cumsum(docs_all, out=docs_all)
                seg_starts = pair_off[:-1]
                adj = np.zeros(len(dfs_arr), np.int64)
                adj[1:] = docs_all[seg_starts[1:] - 1]
                docs_all -= repeat_int(adj - bases_arr, dfs_arr)
            tfs_all = _u32(tf_data)
            # positions stay a zero-copy u32 DELTA view; each term's positions
            # are restored inside the merge loop (small arrays the allocator
            # recycles) rather than materializing whole-shard i64 temporaries
            pos_all = _u32(pos_data)

            # term-group boundaries over rows (object != is an elementwise C loop)
            n = group.num_rows
            new_term = np.empty(n, bool)
            new_term[0] = True
            np.logical_or(terms_arr[1:] != terms_arr[:-1],
                          fields_arr[1:] != fields_arr[:-1], out=new_term[1:])
            tstarts = np.flatnonzero(new_term)
            tends = np.append(tstarts[1:], n)

            for i, j in zip(tstarts, tends):
                docs = docs_all[pair_off[i]:pair_off[j]]
                tfs = tfs_all[pair_off[i]:pair_off[j]]
                nid_t = nid_data[nid_off[i]:nid_off[j]]
                has_pos = posv_off[j] > posv_off[i]
                if has_pos:
                    # restore this term's absolute positions from within-pair
                    # deltas: pair-segmented cumsum over a term-sized slice
                    pos_d = pos_all[posv_off[i]:posv_off[j]]
                    tf_t = tfs.astype(np.int64)
                    cp = np.cumsum(pos_d, dtype=np.int64)
                    adj = np.zeros(len(tf_t), np.int64)
                    if len(tf_t) > 1:
                        adj[1:] = cp[np.cumsum(tf_t[:-1]) - 1]
                    pos = (cp - np.repeat(adj, tf_t)).astype(np.uint32)
                else:
                    pos = None
                # split into u32-addressable runs (needed beyond 2^32 docs)
                run_start = 0
                tf_cum = 0
                while run_start < len(docs):
                    run_base = int(docs[run_start])
                    run_end = int(np.searchsorted(docs, run_base + RUN_SPAN, side="left"))
                    sl = slice(run_start, run_end)
                    blob = encode_postings((docs[sl] - run_base).astype(np.uint32),
                                           tfs[sl])
                    off = post_buf.tell()
                    post_buf.write(blob)
                    ttf_run = int(tfs[sl].sum())
                    if pos is not None:
                        pblob = encode_positions(pos[tf_cum:tf_cum + ttf_run])
                        poff = pos_buf.tell()
                        pos_buf.write(pblob)
                    else:
                        poff, pblob = -1, b""
                    tf_cum += ttf_run
                    dict_rows["key"].append(f"{fields_arr[i]}\x00{terms_arr[i]}")
                    dict_rows["field"].append(fields_arr[i])
                    dict_rows["term"].append(terms_arr[i])
                    dict_rows["run_base"].append(run_base)
                    dict_rows["df"].append(run_end - run_start)
                    dict_rows["ttf"].append(ttf_run)
                    dict_rows["offset"].append(off)
                    dict_rows["nbytes"].append(len(blob))
                    dict_rows["pos_offset"].append(poff)
                    dict_rows["pos_nbytes"].append(len(pblob))
                    # cold (reduce-encoded) runs get frontiers too: the
                    # partial ships a u8 fieldnorm id per pair, so a
                    # mid-frequency term (below the per-partition hot
                    # threshold but with large TOTAL df at scale) still
                    # prunes. Empty nids = no-norm field / old partials.
                    if len(nid_t) == len(docs):
                        bm = pcodec.block_frontier_blob(tfs[sl],
                                                        nid_t[sl])
                        boff = bm_buf.tell()
                        bm_buf.write(bm)
                        dict_rows["bm_offset"].append(boff)
                        dict_rows["bm_nbytes"].append(len(bm))
                    else:
                        dict_rows["bm_offset"].append(-1)
                        dict_rows["bm_nbytes"].append(0)
                    run_start = run_end

        if n_enc:
            # pre-encoded fragments: append each blob VERBATIM as its own
            # posting run (one buffer write per fragment, zero decode)
            e_fields = enc.column("field").to_pylist()
            e_terms = enc.column("term").to_pylist()
            e_base = enc.column("run_base").to_numpy(zero_copy_only=False)
            e_df = enc.column("df").to_numpy(zero_copy_only=False)
            e_ttf = enc.column("ttf").to_numpy(zero_copy_only=False)
            eb_off, eb_data = _binary_column_view(enc.column("postings"))
            ep_off, ep_data = _binary_column_view(enc.column("positions"))
            if "blockmax" in enc.column_names:
                em_off, em_data = _binary_column_view(enc.column("blockmax"))
            else:  # partials from a pre-frontier build (resume compat)
                em_off = np.zeros(n_enc + 1, np.int64)
                em_data = np.empty(0, np.uint8)
            for k in range(n_enc):
                off = post_buf.tell()
                post_buf.write(eb_data[eb_off[k]:eb_off[k + 1]])
                pnb = int(ep_off[k + 1] - ep_off[k])
                if pnb:
                    poff = pos_buf.tell()
                    pos_buf.write(ep_data[ep_off[k]:ep_off[k + 1]])
                else:
                    poff = -1
                bnb = int(em_off[k + 1] - em_off[k])
                if bnb:
                    boff = bm_buf.tell()
                    bm_buf.write(em_data[em_off[k]:em_off[k + 1]])
                else:
                    boff = -1
                dict_rows["key"].append(f"{e_fields[k]}\x00{e_terms[k]}")
                dict_rows["field"].append(e_fields[k])
                dict_rows["term"].append(e_terms[k])
                dict_rows["run_base"].append(int(e_base[k]))
                dict_rows["df"].append(int(e_df[k]))
                dict_rows["ttf"].append(int(e_ttf[k]))
                dict_rows["offset"].append(off)
                dict_rows["nbytes"].append(int(eb_off[k + 1] - eb_off[k]))
                dict_rows["pos_offset"].append(poff)
                dict_rows["pos_nbytes"].append(pnb)
                dict_rows["bm_offset"].append(boff)
                dict_rows["bm_nbytes"].append(bnb)

    terms_tbl = pa.table(dict_rows)
    if n_enc:
        # readers binary-search the dictionary: restore global key order
        # (UTF-8 bytewise == code-point order, matching the cold sort);
        # (key, run_base) pairs are unique, so this is deterministic
        import pyarrow.compute as pc
        terms_tbl = terms_tbl.take(pc.sort_indices(
            terms_tbl, sort_keys=[("key", "ascending"),
                                  ("run_base", "ascending")]))
    meta = {"sid": sid, "num_terms": len(dict_rows["key"]),
            "write_s": round(time.monotonic() - t0, 4)}
    terms_tbl = terms_tbl.replace_schema_metadata({"shard_meta": json.dumps(meta)})
    # terms.parquet lands last: its presence marks the shard complete
    st.write_parquet_atomic(terms_tbl, st.sjoin(shard_dir, "terms.parquet"))

    return pa.table({"sid": pa.array([sid], pa.int32()),
                     "num_terms": pa.array([len(dict_rows["key"])], pa.int64()),
                     "postings_bytes": pa.array([post_buf.tell()], pa.int64()),
                     "positions_bytes": pa.array([pos_buf.tell()], pa.int64())})


def _write_shard_from_partials(batch: pa.Table, index_dir: str,
                               pids: list[int]) -> pa.Table:
    """Reduce task: read this shard's per-partition partial files straight
    from storage and merge them (the storage-backed shuffle's reduce
    side — reads exactly 1/num_shards of the map output, no exchange)."""
    from tantivy4java_ray import storage as st
    outs = []
    for sid in batch.column("sid").to_pylist():
        pieces = []
        enc_pieces = []
        for pid in pids:
            p = st.sjoin(index_dir, "_partials", f"part-{pid:05d}",
                         f"shard-{int(sid):05d}.parquet")
            if st.sexists(p):
                pieces.append(st.read_parquet_any(p))
            ep = st.sjoin(index_dir, "_partials", f"part-{pid:05d}",
                          f"shard-{int(sid):05d}.enc.parquet")
            if st.sexists(ep):
                # uncompressed on purpose: memory_map zero-copies the
                # blob bytes straight out of the page cache
                enc_pieces.append(st.read_parquet_any(ep, memory_map=True))
        group = (pa.concat_tables(pieces) if pieces else
                 _PARTIAL_SCHEMA.empty_table())
        enc = (pa.concat_tables(enc_pieces) if enc_pieces else
               _ENC_SCHEMA.empty_table())
        if group.num_rows == 0 and enc.num_rows == 0:
            # an empty shard writes nothing — purge any shard dir left
            # by an interrupted PRIOR attempt (no committed manifest =
            # the rebuild purge never ran; a stale terms.parquet here
            # would serve the old doc-id space as live results)
            sd = st.sjoin(index_dir, "shards", f"shard-{int(sid):05d}")
            if st.sexists(sd):
                st.srmtree(sd)
        outs.append(_write_shard(group, index_dir, enc))
    return pa.concat_tables(outs)


# ---------------------------------------------------------------------------
# driver orchestration
# ---------------------------------------------------------------------------

@dataclass
class BuildResult:
    index_dir: str
    num_docs: int
    num_partitions: int
    num_shards: int
    elapsed_s: float
    resumed_partitions: int = 0
    #: wall time per build phase (plan/map/reduce/finalize) — the
    #: scaling harness reads this to attribute efficiency loss
    phase_s: dict | None = None

    @property
    def docs_per_sec(self) -> float:
        return self.num_docs / self.elapsed_s if self.elapsed_s else float("inf")


class IndexBuilder:
    """Configured builder; ``build()`` runs the full pipeline."""

    def __init__(self,
                 paths: str | list[str],
                 index_dir: str,
                 schema: IndexSchema | None = None,
                 *,
                 text_fields: tuple[str, ...] = ("text",),
                 html_fallback: tuple[str, str] | None = None,
                 target_docs_per_partition: int = 100_000,
                 num_shards: int | None = None,
                 checkpoint: bool = True,
                 exact_fieldnorms: bool = False,
                 concurrency: int | None = None,
                 bm25_k1: float = 1.2,
                 bm25_b: float = 0.75,
                 hot_salts: int = 4,
                 hot_df_frac: float = 0.05,
                 column_renames: dict[str, str] | None = None,
                 phash_fields: tuple[str, ...] = (),
                 keep_partials: bool = False,
                 frag_min_df: int | None = None):
        self.paths = paths
        self.index_dir = index_dir
        self.schema = schema
        self.text_fields = text_fields
        self.html_fallback = html_fallback
        self.target = target_docs_per_partition
        self.num_shards = num_shards
        self.checkpoint = checkpoint
        self.keep_partials = keep_partials
        self.exact_fieldnorms = exact_fieldnorms
        self.concurrency = concurrency
        self.bm25 = {"k1": bm25_k1, "b": bm25_b}
        self.hot_salts = hot_salts
        self.hot_df_frac = hot_df_frac
        self.column_renames = column_renames
        self.phash_fields = tuple(phash_fields)
        self.frag_min_df = frag_min_df

    def build(self) -> BuildResult:
        import ray
        import ray.data

        from tantivy4java_ray import storage as st

        t0 = time.monotonic()
        plan = plan_partitions(self.paths, self.target)
        # idempotent fast path: a committed build over the same plan is
        # reused (the txlog is the source of truth; resume semantics)
        mpath = st.sjoin(self.index_dir, "manifest.json")
        if st.sexists(mpath):
            state = st.read_json_any(mpath)
            # same files AND same requested schema/shards — a re-run
            # with a different schema or shard count must rebuild, not
            # silently return the stale index (the partition-level
            # config fingerprint then forces the actual re-map)
            cfg = state["meta"].get("config") or {}
            # feature-affecting config must match too: silently
            # returning an index built without exact fieldnorms /
            # phashes / the same salting would ignore the request
            cfg_same = (
                cfg.get("exact_fieldnorms", False) == self.exact_fieldnorms
                and cfg.get("hot_salts", 4) == self.hot_salts
                and (cfg.get("html_fallback") or None)
                == (list(self.html_fallback) if self.html_fallback else None)
                and tuple(cfg.get("phash_fields") or ()) == self.phash_fields
                and (cfg.get("column_renames") or None)
                == (self.column_renames or None)
                # bm25 k1/b are read-time-only, but IndexReader reads
                # them from meta — reusing a committed index silently
                # scores with the stale parameters
                and (cfg.get("bm25") or {"k1": 1.2, "b": 0.75}) == self.bm25
                # pre-frontier committed indexes rebuild once so the
                # pruned top-k path has its block-max sidecar
                and "blockmax_frontier" in (cfg.get("index_features") or ()))
            if (state.get("committed") and cfg_same
                    and state["meta"]["plan"]["files"] == plan.files
                    and state["meta"]["plan"]["num_docs"] == plan.num_docs
                    and (self.schema is None
                         or state["meta"].get("schema")
                         == self.schema.to_dict())
                    and (self.num_shards is None
                         or state["meta"]["plan"].get("num_shards")
                         == self.num_shards)):
                m = state["meta"]["plan"]
                return BuildResult(self.index_dir, m["num_docs"],
                                   m["num_partitions"], m["num_shards"],
                                   time.monotonic() - t0,
                                   resumed_partitions=m["num_partitions"])
            if state.get("committed"):
                # committed under a DIFFERENT plan/schema: rebuild from
                # scratch. Everything the old index wrote must go — a
                # fresh plan with fewer partitions/shards would
                # otherwise leave stale pids in the replayed state,
                # stale shard dirs in the dir (which bundling packs),
                # and stale deleted_docs.npy whose tombstone doc ids
                # would silently mask the NEW docs at query time
                # (IndexReader loads it unconditionally)
                for sub in ("txlog", "docdata", "_partials", "shards"):
                    p = st.sjoin(self.index_dir, sub)
                    if st.sexists(p):
                        st.srmtree(p)
                st.sunlink(st.sjoin(self.index_dir, "deleted_docs.npy"))
                st.sunlink(mpath)
        if self.schema is None:
            self.schema = infer_index_schema(
                st.parquet_file_any(plan.files[0]).schema_arrow,
                text_fields=self.text_fields,
                skip_fields=(self.html_fallback[1],) if self.html_fallback else ())
        nshards = self.num_shards or max(
            1, min(64, (plan.num_docs + 49_999) // 50_000))
        npart = len(plan.partitions)
        txlog = TransactionLog(self.index_dir)
        txlog.append([{"set_meta": {
            "plan": {"files": plan.files, "num_docs": plan.num_docs,
                     "num_partitions": npart, "num_shards": nshards},
            "schema": self.schema.to_dict(),
            "config": {"target_docs_per_partition": self.target,
                       "exact_fieldnorms": self.exact_fieldnorms,
                       "bm25": self.bm25,
                       "hot_salts": self.hot_salts,
                       "html_fallback": self.html_fallback,
                       "phash_fields": list(self.phash_fields),
                       "column_renames": self.column_renames or None,
                       # capability stamps queries can gate on (readers
                       # of OLDER indexes fail loudly, not silently)
                       "index_features": ["json_numeric_terms",
                                          "ip_u128_terms",
                                          "blockmax_frontier"]}}}])

        try:
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        # the map stage may take every CPU: its input blocks exist up
        # front (from_items), it runs as plain tasks (no pool teardown
        # stall), and the pipeline breaks at a materialize() before the
        # reduce stage needs CPUs
        conc = max(1, min(self.concurrency or npart, npart, cpus))

        t_plan = time.monotonic()
        specs = [p.to_row() for p in plan.partitions]
        # one block per partition spec up front — repartition() is an
        # AllToAll operator and costs seconds even for 24 rows
        ds = ray.data.from_items(specs, override_num_blocks=npart)
        # map side: index partitions; partial postings are written to
        # storage split BY SHARD (the external-shuffle map output). Only
        # tiny per-partition summaries flow through the object store.
        indexer_kwargs = dict(
            schema_dict=self.schema.to_dict(), index_dir=self.index_dir,
            num_shards=nshards, html_fallback=self.html_fallback,
            exact_fieldnorms=self.exact_fieldnorms,
            checkpoint=self.checkpoint, hot_salts=self.hot_salts,
            hot_df_frac=self.hot_df_frac,
            column_renames=self.column_renames,
            phash_fields=self.phash_fields,
            frag_min_df=self.frag_min_df)
        # a TASK pool, not an actor pool: Ray reuses worker processes, so
        # the per-worker indexer cache gives the same setup-once-per-
        # worker semantics, while the reduce stage below can start
        # scheduling the moment CPUs free (an actor pool holds every CPU
        # until its async teardown completes — a measured multi-second
        # stall between the phases)
        # the per-partition summaries also carry the resumed flag — the
        # map task is the single authority on the skip decision (the
        # driver previously re-read every footer serially to recount it)
        summaries = ds.map_batches(
            _index_partition_task, fn_kwargs={"kwargs": indexer_kwargs},
            batch_format="pyarrow", batch_size=None,
            concurrency=conc, num_cpus=1).take_all()
        resumed = sum(1 for r in summaries if r["resumed"])
        t_map = time.monotonic()
        # reduce side: one task per shard reads its own partial files —
        # no sort exchange, no index-sized data in the object store
        pids = [p.pid for p in plan.partitions]
        idx_dir = self.index_dir
        shard_ds = ray.data.from_items(
            [{"sid": s} for s in range(nshards)],
            override_num_blocks=nshards)
        shard_stats = shard_ds.map_batches(
            lambda b: _write_shard_from_partials(b, idx_dir, pids),
            batch_format="pyarrow", batch_size=None,
            num_cpus=1).take_all()
        t_reduce = time.monotonic()

        # finalize: per-partition lineage from docdata footers -> txlog
        actions: list[dict] = []
        num_docs = 0
        total_tokens: dict[str, int] = {}
        from concurrent.futures import ThreadPoolExecutor

        def _read_meta(p):
            path = st.sjoin(self.index_dir, "docdata",
                            f"part-{p.pid:05d}.parquet")
            return json.loads(st.read_parquet_metadata_any(path)
                              .metadata[b"build_meta"].decode())

        with ThreadPoolExecutor(8) as ex:  # footer reads are IO-bound
            metas = list(ex.map(_read_meta, plan.partitions))
        for meta in metas:
            num_docs += meta["num_docs"]
            for f_, t_ in meta["total_tokens"].items():
                total_tokens[f_] = total_tokens.get(f_, 0) + t_
            actions.append({"add_partition": meta})
        for s in shard_stats:
            actions.append({"add_shard": {k: (v.item() if hasattr(v, "item") else v)
                                          for k, v in s.items()}})
        stats = {"num_docs": num_docs, "total_tokens": total_tokens,
                 "avgdl": {f_: (t_ / num_docs if num_docs else 0.0)
                           for f_, t_ in total_tokens.items()}}
        actions.append({"set_meta": {"stats": stats}})
        actions.append({"commit": {"ts": time.time()}})
        txlog.append(actions)
        txlog.create_checkpoint()
        # fast-open manifest snapshot
        atomic_write_json(st.sjoin(self.index_dir, "manifest.json"),
                          txlog.read_state())
        # the external-shuffle map outputs are ~index-sized; they exist
        # to feed the shard writers and to resume an INTERRUPTED build —
        # after a committed build they'd permanently double the index's
        # storage footprint, so drop them (the committed fast path above
        # never re-enters the partition stage)
        if not self.keep_partials:
            st.srmtree(st.sjoin(self.index_dir, "_partials"))

        t_end = time.monotonic()
        return BuildResult(self.index_dir, num_docs, npart, nshards,
                           t_end - t0, resumed,
                           phase_s={"plan": round(t_plan - t0, 3),
                                    "map": round(t_map - t_plan, 3),
                                    "reduce": round(t_reduce - t_map, 3),
                                    "finalize": round(t_end - t_reduce, 3)})


def build_index(paths: str | list[str], index_dir: str,
                schema: IndexSchema | None = None, **kw: Any) -> BuildResult:
    return IndexBuilder(paths, index_dir, schema, **kw).build()
