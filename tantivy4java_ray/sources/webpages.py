"""Deterministic synthetic Common-Crawl-style ``webpages`` table.

Exactly the shape demanded by BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``,
synthesized per FIXTURES.md F1 (seed=42, Zipf(s=1.1) over a 10k-word
vocabulary, lognormal doc lengths ~200 tokens capped at 2000, ~5% null
``text`` rows exercising the html->text fallback, marker tokens
``needleterm`` (doc_id % 97 == 0) and the phrase ``alpha bravo charlie``
(doc_id % 997 == 0), Zipf head words w0000..w0009 in most docs to exercise
the skew path). No external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 10_000
_LANGS = ["en"] * 18 + ["de", "fr"]


def generate_webpages(n_rows: int, seed: int = 42,
                      start_doc_id: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed + start_doc_id)
    doc_ids = np.arange(start_doc_id, start_doc_id + n_rows)

    lengths = np.clip(rng.lognormal(np.log(200), 0.7, n_rows), 5, 2000
                      ).astype(np.int64)
    total = int(lengths.sum())
    word_ids = np.minimum(rng.zipf(1.1, total), VOCAB) - 1
    words = np.array([f"w{i:04d}" for i in range(VOCAB)], dtype=object)
    flat = words[word_ids]
    offsets = np.concatenate(([0], np.cumsum(lengths)))

    texts: list[str | None] = []
    urls: list[str] = []
    htmls: list[bytes] = []
    langs: list[str] = []
    for i, did in enumerate(doc_ids):
        toks = list(flat[offsets[i]:offsets[i + 1]])
        if did % 97 == 0:
            toks.insert(len(toks) // 2, "needleterm")
        if did % 997 == 0:
            toks[len(toks) // 3:len(toks) // 3] = ["alpha", "bravo", "charlie"]
        text = " ".join(toks)
        urls.append(f"https://site{did % 1000}.example/page/{did}")
        htmls.append(b"<html><head><title>T%d</title></head><body><p>" % did
                     + text.encode() + b"</p></body></html>")
        # ~5% of rows: null text -> build must fall back to html extraction
        texts.append(None if did % 20 == 7 else text)
        langs.append("" if did % 20 == 19 else _LANGS[did % 20])

    ts0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    warc_ts = pa.array(ts0 + doc_ids * 1_000_000,
                       pa.timestamp("us"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": warc_ts,
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def write_webpages(out_dir: str, n_rows: int, n_files: int = 1,
                   rows_per_row_group: int | None = None,
                   seed: int = 42) -> list[str]:
    """Write the table as ``n_files`` parquet files (deterministic split)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n_rows + n_files - 1) // n_files
    base = 0
    for i in range(n_files):
        rows = min(per, n_rows - base)
        if rows <= 0:
            break
        tbl = generate_webpages(rows, seed=seed, start_doc_id=base)
        path = os.path.join(out_dir, f"webpages-{i:04d}.parquet")
        pq.write_table(tbl, path,
                       row_group_size=rows_per_row_group or rows)
        paths.append(path)
        base += rows
    return paths
