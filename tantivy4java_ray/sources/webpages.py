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
    """Vectorized generation (token join + html wrap in Arrow kernels);
    output is token-for-token identical to the original per-doc loop."""
    import pyarrow.compute as pc
    rng = np.random.default_rng(seed + start_doc_id)
    doc_ids = np.arange(start_doc_id, start_doc_id + n_rows)

    lengths = np.clip(rng.lognormal(np.log(200), 0.7, n_rows), 5, 2000
                      ).astype(np.int64)
    total = int(lengths.sum())
    word_ids = np.minimum(rng.zipf(1.1, total), VOCAB) - 1
    words = np.array([f"w{i:04d}" for i in range(VOCAB)], dtype=object)
    flat = words[word_ids]
    offsets = np.concatenate(([0], np.cumsum(lengths)))

    # marker insertion, replicated exactly: needleterm first (before index
    # len//2), then the phrase (before index len//3 of the post-needle doc)
    needle_docs = np.flatnonzero(doc_ids % 97 == 0)
    ins_pos = offsets[needle_docs] + lengths[needle_docs] // 2
    flat = np.insert(flat, ins_pos, "needleterm")
    lengths2 = lengths.copy()
    lengths2[needle_docs] += 1
    offsets2 = np.concatenate(([0], np.cumsum(lengths2)))
    phrase_docs = np.flatnonzero(doc_ids % 997 == 0)
    ppos = offsets2[phrase_docs] + lengths2[phrase_docs] // 3
    flat = np.insert(flat, np.repeat(ppos, 3),
                     np.tile(np.array(["alpha", "bravo", "charlie"],
                                      object), len(phrase_docs)))
    lengths3 = lengths2.copy()
    lengths3[phrase_docs] += 3
    offsets3 = np.concatenate(([0], np.cumsum(lengths3)))

    toks_arr = pa.array(flat, pa.string())
    if offsets3[-1] < 2**31:
        lists = pa.ListArray.from_arrays(
            pa.array(offsets3, pa.int32()), toks_arr)
    else:
        # >= 2^31 total token bytes need 64-bit offsets, which means a
        # LargeListArray (ListArray.from_arrays requires int32 offsets)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets3, pa.int64()), toks_arr)
    text_all = pc.binary_join(lists, " ")

    urls = pa.array([f"https://site{d % 1000}.example/page/{d}"
                     for d in doc_ids], pa.string())
    titles = pa.array([f"<html><head><title>T{d}</title></head><body><p>"
                       for d in doc_ids], pa.string())
    html = pc.binary_join_element_wise(
        titles, text_all, pa.scalar("</p></body></html>"), "")
    null_mask = (doc_ids % 20 == 7)
    texts = pc.if_else(pa.array(~null_mask), text_all,
                       pa.scalar(None, pa.string()))
    langs = pa.array(["" if d % 20 == 19 else _LANGS[d % 20]
                      for d in doc_ids], pa.string())

    ts0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    warc_ts = pa.array(ts0 + doc_ids * 1_000_000, pa.timestamp("us"))
    return pa.table({
        "url": urls,
        "warc_ts": warc_ts,
        "html": html.cast(pa.binary()),
        "text": texts,
        "lang": langs,
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
