"""Reference-shaped convenience API.

A thin facade so a user of the reference library can switch with familiar
names: ``SchemaBuilder`` -> ``Index.create_from_parquet`` ->
``index.searcher()`` -> ``searcher.search/doc/doc_batch/aggregate`` —
mapping onto the Ray-Data-native build/search pipelines underneath.

Reference surface mirrored: ``core/SchemaBuilder.java``,
``core/Index.java`` (open/createFromParquet/parseQuery/registerTokenizer),
``core/Searcher.java`` (search/doc/docBatch/docFreq/aggregate),
``split/merge/QuickwitSplit.java`` (mergeSplits -> ``merge_indexes``).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from tantivy4java_ray.analyzer import TextAnalyzer, register_tokenizer
from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.merge import merge_indexes
from tantivy4java_ray.pipelines.search import (
    IndexReader, SearchResult, read_index_metadata, validate_index,
)
from tantivy4java_ray.query import Query, parse_query
from tantivy4java_ray.schema import IndexSchema

SchemaBuilder = IndexSchema  # builder-style add_* methods live on IndexSchema


class Searcher:
    """``core/Searcher.java`` analog over an open index.

    Resolves the reader through its ``Index`` on every call, so
    ``index.reload()`` after a commit is observed by searchers already
    handed out (a captured reader would silently keep serving the
    pre-commit view forever)."""

    def __init__(self, index: "Index"):
        self._index = index

    @property
    def _r(self) -> IndexReader:
        return self._index.reader()

    def search(self, query: Query | str, limit: int = 10,
               offset: int = 0, method: str = "auto") -> SearchResult:
        return self._r.search(query, limit=limit, offset=offset,
                              method=method)

    def doc(self, doc_id: int, fields: list[str] | None = None) -> dict:
        tbl = self._r.retrieve_docs([doc_id], columns=fields)
        return {c: tbl.column(c)[0].as_py() for c in tbl.column_names}

    def doc_batch(self, doc_ids: list[int],
                  fields: list[str] | None = None) -> pa.Table:
        return self._r.retrieve_docs(doc_ids, columns=fields)

    def doc_freq(self, field: str, term: str) -> int:
        return self._r.doc_freq(field, term)

    def num_docs(self) -> int:
        return self._r.num_docs

    def aggregate(self, query: Query | None, aggs: dict) -> dict:
        return self._r.aggregate(query, aggs)

    def explain(self, query: Query, doc_id: int) -> dict:
        return self._r.explain(query, doc_id)


class Index:
    """``core/Index.java`` analog: a built index directory."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self._reader: IndexReader | None = None

    # -- build ---------------------------------------------------------------
    @classmethod
    def create_from_parquet(cls, paths: str | list[str], index_dir: str,
                            schema: IndexSchema | None = None,
                            **build_kwargs: Any) -> "Index":
        """``QuickwitSplit.createFromParquet`` / parquet-companion entry."""
        build_index(paths, index_dir, schema, **build_kwargs)
        return cls(index_dir)

    @classmethod
    def create_from_documents(cls, docs, index_dir: str,
                              schema: IndexSchema | None = None,
                              **build_kwargs: Any) -> "Index":
        """``IndexWriter.addDocument``/``Document.fromMap`` analog: ingest
        in-memory rows (list of dicts or a pyarrow Table). Rows are staged
        as parquet under the index dir, then the normal distributed build
        runs — document ingestion is just a tiny parquet source."""
        import os

        import pyarrow.parquet as pq
        import hashlib
        import io

        if isinstance(docs, list):
            docs = pa.Table.from_pylist(docs)
        stage = os.path.join(index_dir, "_ingest")
        os.makedirs(stage, exist_ok=True)
        # content-addressed staging name: build_index's committed fast
        # path fingerprints file PATHS + row counts, so re-ingesting
        # DIFFERENT docs with the same count at a fixed name would
        # silently reuse the stale index while the retrieval source
        # parquet underneath it was already overwritten (old postings
        # positionally joined to new rows). Same docs -> same name ->
        # the fast path still applies.
        buf = io.BytesIO()
        pq.write_table(docs, buf)
        tag = hashlib.md5(buf.getvalue()).hexdigest()[:12]
        path = os.path.join(stage, f"docs-{tag}.parquet")
        if not os.path.exists(path):
            with open(path + ".tmp", "wb") as f:
                f.write(buf.getvalue())
            os.replace(path + ".tmp", path)
        build_index(path, index_dir, schema, **build_kwargs)
        return cls(index_dir)

    @staticmethod
    def merge(index_dirs: list[str], out_dir: str,
              delete_queries: list[Query] | None = None) -> "Index":
        merge_indexes(index_dirs, out_dir, delete_queries=delete_queries)
        return Index(out_dir)

    def writer(self, schema: IndexSchema | None = None, *,
               heap_docs: int = 100_000, num_shards: int | None = None):
        """Streaming ingest handle (``Index.writer`` analog): buffered
        add_document/add_json with commit/rollback; each commit
        LSM-merges a delta into this index. Call ``reload()`` after a
        commit to observe it."""
        from tantivy4java_ray.pipelines.writer import IndexWriter
        if schema is None:
            schema = self.schema
        return IndexWriter(self.index_dir, schema, heap_docs=heap_docs,
                           num_shards=num_shards)

    # -- read ----------------------------------------------------------------
    def reader(self) -> IndexReader:
        if self._reader is None:
            self._reader = IndexReader(self.index_dir)
        return self._reader

    def reload(self) -> None:
        """``Index.reload`` analog — drop caches, re-read the manifest."""
        self._reader = None

    def searcher(self) -> Searcher:
        return Searcher(self)

    @property
    def schema(self) -> IndexSchema:
        return self.reader().schema

    def parse_query(self, text: str,
                    default_fields: list[str] | None = None,
                    lenient: bool = False) -> Query:
        return parse_query(text, self.reader().schema,
                           default_fields=default_fields, lenient=lenient)

    @staticmethod
    def register_tokenizer(name: str, analyzer: TextAnalyzer) -> None:
        register_tokenizer(name, analyzer)

    def metadata(self) -> dict:
        return read_index_metadata(self.index_dir)

    def validate(self, deep: bool = False) -> list[str]:
        problems = validate_index(self.index_dir)
        if deep:
            from tantivy4java_ray.pipelines.integrity import \
                verify_checksums
            problems = problems + verify_checksums(self.index_dir)
        return problems

    def write_checksums(self) -> dict:
        """Generate the ``checksums.json`` integrity sidecar."""
        from tantivy4java_ray.pipelines.integrity import write_checksums
        return write_checksums(self.index_dir)
