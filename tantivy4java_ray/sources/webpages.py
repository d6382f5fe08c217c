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
#: doc_id % 20 -> lang: en 85%, de/fr/"" 5% each (F1)
_LANGS = ["en"] * 17 + ["de", "fr", ""]


def _zipf_words(rng: np.random.Generator, total: int) -> np.ndarray:
    """``total`` Zipf(1.1) samples REJECTION-limited to the vocabulary.
    Clamping with np.minimum would funnel the entire out-of-range tail
    (~37% of mass at s=1.1) onto the LAST word, making w9999 the
    hottest term instead of the Zipf head w0000."""
    parts: list[np.ndarray] = []
    need = total
    while need > 0:
        draw = rng.zipf(1.1, int(need * 1.7) + 16)
        draw = draw[draw <= VOCAB][:need]
        parts.append(draw)
        need -= len(draw)
    return np.concatenate(parts) - 1


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
    word_ids = _zipf_words(rng, total)
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

    # plain string carries int32 BYTE offsets: past 2 GiB of token bytes
    # (~1.6M docs in one call) pa.array silently returns a ChunkedArray
    # and ListArray.from_arrays raises. Detect that and switch the WHOLE
    # join pipeline to the large (64-bit-offset) kernels — binary_join
    # has no mixed list<large_string>/string kernel.
    toks_arr = pa.array(flat, pa.string())
    if (not isinstance(toks_arr, pa.ChunkedArray)
            and offsets3[-1] < 2**31):
        lists = pa.ListArray.from_arrays(
            pa.array(offsets3, pa.int32()), toks_arr)
        sep = " "
    else:
        toks_arr = pa.array(flat, pa.large_string())
        if isinstance(toks_arr, pa.ChunkedArray):
            toks_arr = toks_arr.combine_chunks()
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets3, pa.int64()), toks_arr)
        sep = pa.scalar(" ", pa.large_string())
    text_all = pc.binary_join(lists, sep)
    if pa.types.is_large_string(text_all.type):
        try:
            # keep the documented text:string schema whenever it fits
            text_all = text_all.cast(pa.string())
        except pa.ArrowInvalid:
            pass  # > 2 GiB of text in one call: stay large_string

    urls = pa.array([f"https://site{d % 1000}.example/page/{d}"
                     for d in doc_ids], pa.string())
    # match the html-join operand types to text_all: the element-wise
    # join has no mixed string/large_string kernel, and past 2 GiB the
    # html column itself needs 64-bit (large_binary) offsets
    stype = text_all.type
    btype = (pa.large_binary() if pa.types.is_large_string(stype)
             else pa.binary())
    titles = pa.array([f"<html><head><title>T{d}</title></head><body><p>"
                       for d in doc_ids], stype)
    html = pc.binary_join_element_wise(
        titles, text_all, pa.scalar("</p></body></html>", stype),
        pa.scalar("", stype))
    null_mask = (doc_ids % 20 == 7)
    texts = pc.if_else(pa.array(~null_mask), text_all,
                       pa.scalar(None, stype))
    langs = pa.array([_LANGS[d % 20] for d in doc_ids], pa.string())

    ts0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    warc_ts = pa.array(ts0 + doc_ids * 1_000_000, pa.timestamp("us"))
    return pa.table({
        "url": urls,
        "warc_ts": warc_ts,
        "html": html.cast(btype),
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
