"""Composed web-corpus curation pipeline: score -> filter -> dedup.

The training-data shape the engine exists to serve (the reference stops
at indexing; SURVEY.md §2.7 lists curation as the first-class addition a
100 TB pipeline needs): language-ID + quality-score every document,
filter to the keepable subset, exact-dedup the survivors, and emit the
per-document stats a downstream tokenizer/packer consumes.

Scale shape (the whole point of composing INSIDE one Dataset pipeline):

- ONE vectorized pass computes quality + language-ID per batch and
  filters in-batch — rejected text never leaves the map task, so at a
  99%-reject web crawl the downstream shuffle sees 1% of the bytes.
- the only shuffle is exact-dedup's ``groupby(__h)`` over
  ``(h1, h2, id, 4 small stat cols)`` ≈ 60 B/row — the text column is
  dropped before the exchange (same contract as ``exact_dedup``).
- streaming end-to-end: no driver materialization; consume with
  ``write_parquet`` / ``to_pandas`` on the (small) survivor stats.

Every stage is individually SQL-oracled (quality, language_id,
dedup_exact, token_stats); the composition is oracled as
``curation_pipeline`` in ``__ray_entry__`` — a single DuckDB query
reproduces the full pipeline bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tantivy4java_ray.functions.dedup import exact_dedup_keys
from tantivy4java_ray.functions.textstats import LanguageId, quality_batch


class _ScoreFilter:
    """Actor-pool stage: quality + language-ID + in-batch filter +
    dedup keys, one vectorized pass; profiles/analyzer built once."""

    def __init__(self, col: str, id_col: str, min_quality: float,
                 langs: tuple[str, ...] | None):
        self.col, self.id_col = col, id_col
        self.min_quality = float(min_quality)
        self.langs = tuple(langs) if langs else None
        self.langid = LanguageId(col=col, id_col=id_col)

    def __call__(self, t: pa.Table) -> pa.Table:
        from tantivy4java_ray.analyzer import get_analyzer, tokenize_column
        text = t.column(self.col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # tokenize ONCE and share: quality + language-ID both consume
        # the same tokenization, the dominant CPU of this stage
        tok = tokenize_column(text, get_analyzer("default"))
        q = quality_batch(t, self.col, self.id_col, tok=tok)
        lg = self.langid(t, tok=tok)
        keep = np.asarray(q.column("quality").to_numpy()
                          >= self.min_quality)
        pred = np.asarray(lg.column("lang_pred").to_numpy(
            zero_copy_only=False), object)
        if self.langs is not None:
            keep &= np.isin(pred, self.langs)
        idx = np.flatnonzero(keep)
        sub = t.take(idx)
        keys = exact_dedup_keys(sub, self.col, self.id_col)
        # text is DROPPED here: survivors ship 24 B of identity + the
        # stat columns, never the document body
        return pa.table({
            self.id_col: sub.column(self.id_col),
            # explicit type: an all-rejected batch would otherwise infer
            # Arrow `null` and destabilize the stream's block schema
            "lang_pred": pa.array(pred[idx].astype(object),
                                  type=pa.string()),
            "quality": q.column("quality").take(idx),
            "n_tokens": q.column("n_tokens").take(idx),
            "__h": keys.column("__h"),
            "__h2": keys.column("__h2")})


def curate_documents(ds, *, col: str = "text", id_col: str = "doc_id",
                     min_quality: float = 0.8,
                     langs: tuple[str, ...] | None = ("en",),
                     concurrency: int = 4):
    """-> Dataset of ``(id, lang_pred, quality, n_tokens)`` for documents
    that (a) score ``quality >= min_quality``, (b) are predicted to be in
    ``langs`` (None = keep all), and (c) are the minimum-id survivor of
    their exact-text duplicate group. Streaming; one 60 B/row shuffle."""
    from tantivy4java_ray.functions.dedup import _keepfirst_scan

    def add_pidx(t: pa.Table) -> pa.Table:
        import numpy as np
        return t.append_column(
            "__pidx", pa.array(np.zeros(t.num_rows, np.int64)))

    scored = ds.map_batches(_ScoreFilter, batch_format="pyarrow",
                            fn_constructor_kwargs=dict(
                                col=col, id_col=id_col,
                                min_quality=min_quality, langs=langs),
                            concurrency=(1, concurrency), num_cpus=1)
    # min-id winner per exact-text group via the shared vectorized
    # keep-first scan (stat columns ride the 60 B/row stream as
    # payload); the previous groupby(h).map_groups made one Python
    # call per DISTINCT surviving text
    winners = _keepfirst_scan(scored.map_batches(
        add_pidx, batch_format="pyarrow"), id_col, "winners")
    return winners.map_batches(
        lambda t: t.drop_columns(["__h", "__h2", "__pidx"]),
        batch_format="pyarrow")
