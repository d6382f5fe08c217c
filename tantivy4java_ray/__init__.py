"""tantivy4java_ray — a Ray-Data-native full-text index + BM25 search engine.

A from-scratch reimplementation of the *capabilities* of the reference
``indextables/tantivy4java`` library (a single-process JNI wrapper over
Tantivy/Quickwit; see SURVEY.md), re-expressed as Ray Data pipelines:

- index build = ``read_parquet -> map_batches(tokenize) -> per-partition
  partial postings (combiner) -> groupby(shard) -> segment-shard files``
- query = shard-local posting decode + vectorized BM25 / block-max WAND
- aggregations = partial-per-block + driver merge (Elasticsearch-style DSL)
- plus large-scale training-data ops: dedup, similarity search, text stats.

Nothing here is a port: the reference's JNI/ByteBuffer/tokio machinery is
replaced by Arrow batches in the Ray object store (zero-copy) and the Ray
Data streaming executor.
"""

from tantivy4java_ray.schema import (  # noqa: F401
    FieldType,
    FieldConfig,
    IndexSchema,
    infer_index_schema,
)
from tantivy4java_ray.analyzer import (  # noqa: F401
    TextAnalyzer,
    register_tokenizer,
    tokenize_column,
)
from tantivy4java_ray.query import Occur, Query, parse_query  # noqa: F401
from tantivy4java_ray.pipelines.build import (  # noqa: F401
    IndexBuilder,
    build_index,
)
from tantivy4java_ray.pipelines.merge import merge_indexes  # noqa: F401
from tantivy4java_ray.pipelines.search import (  # noqa: F401
    IndexReader,
    batch_search,
    highlighted_docs_dataset,
    matching_docs_dataset,
)
from tantivy4java_ray.api import Index, Searcher  # noqa: F401

__version__ = "0.1.0"
