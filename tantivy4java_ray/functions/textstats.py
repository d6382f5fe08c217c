"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting — vectorized ``map_batches`` transforms over the
``documents``-style table. All deterministic; token counting reuses the
engine's default analyzer so counts equal index doc lengths."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tantivy4java_ray.analyzer import get_analyzer, tokenize_column


def _round6(x: np.ndarray) -> np.ndarray:
    """Quantize to 6 decimals with half-away-from-zero ties (SQL ROUND
    semantics) so the ratio columns have a well-defined decimal contract
    oracle-checkable against DuckDB; ``np.round`` rounds half-to-EVEN,
    which diverges on exact halves (e.g. 1/128 -> 0.007812 vs 0.007813).
    All inputs here are non-negative."""
    return np.floor(np.asarray(x, np.float64) * 1e6 + 0.5) / 1e6


def token_stats_batch(t: pa.Table, col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """(id, n_tokens, n_unique_tokens) via the vectorized default analyzer."""
    tok = tokenize_column(t.column(col).combine_chunks()
                          if isinstance(t.column(col), pa.ChunkedArray)
                          else t.column(col), get_analyzer("default"))
    n = t.num_rows
    counts = tok["row_token_counts"]
    uniq = np.zeros(n, np.int64)
    if len(tok["row"]):
        # distinct (row, code) pairs -> per-row counts, all numpy
        v = np.int64(len(tok["vocab"]))
        key = tok["row"].astype(np.int64) * v + tok["codes"]
        uk = np.unique(key)
        uniq = np.bincount((uk // v).astype(np.int64),
                           minlength=n).astype(np.int64)
    return pa.table({id_col: t.column(id_col),
                     "n_tokens": pa.array(counts, pa.int64()),
                     "n_unique_tokens": pa.array(uniq, pa.int64())})


def token_stats(ds, col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(lambda t: token_stats_batch(t, col, id_col),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the a an and or of to in is was it for on as with that this "
              "be are at by not from").split()


def quality_batch(t: pa.Table, col: str = "text",
                  id_col: str = "doc_id", tok: dict | None = None
                  ) -> pa.Table:
    """``tok``: optionally a precomputed ``tokenize_column`` result for
    the same column — composed stages (curate) tokenize ONCE and share
    it; tokenization dominates this stage's CPU."""
    text = t.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    n_chars = np.nan_to_num(np.asarray(n_chars, np.float64))
    if tok is None:
        tok = tokenize_column(text, get_analyzer("default"))
    n = t.num_rows
    n_tok = tok["row_token_counts"].astype(np.float64)
    # alpha ratio: fraction of chars that are token chars
    tok_chars = np.zeros(n, np.float64)
    if len(tok["row"]):
        # vocab-level work only: per-token arrays come from fancy
        # indexing; per-doc sums via bincount (np.add.at is the slow
        # unbuffered ufunc path)
        vlen = np.array([len(s) for s in tok["vocab"]], np.float64)
        tok_chars = np.bincount(tok["row"], weights=vlen[tok["codes"]],
                                minlength=n)
        vstop = np.isin(tok["vocab"], _STOPWORDS).astype(np.float64)
        stop_hits = np.bincount(tok["row"], weights=vstop[tok["codes"]],
                                minlength=n)
    else:
        stop_hits = np.zeros(n, np.float64)
    safe_chars = np.maximum(n_chars, 1.0)
    safe_tok = np.maximum(n_tok, 1.0)
    mean_len = tok_chars / safe_tok
    alpha_ratio = tok_chars / safe_chars
    stop_ratio = stop_hits / safe_tok
    # a simple composite in [0,1]: length band + alpha + mean token length
    length_ok = np.clip(n_tok / 50.0, 0, 1) * np.clip(2000.0 / safe_tok, 0, 1)
    score = 0.4 * alpha_ratio + 0.3 * np.clip(mean_len / 6.0, 0, 1) \
        + 0.3 * length_ok
    return pa.table({id_col: t.column(id_col),
                     "n_chars": pa.array(n_chars.astype(np.int64)),
                     "n_tokens": pa.array(n_tok.astype(np.int64)),
                     "alpha_ratio": pa.array(_round6(alpha_ratio)),
                     "mean_token_len": pa.array(_round6(mean_len)),
                     "stopword_ratio": pa.array(_round6(stop_ratio)),
                     "quality": pa.array(_round6(score))})


def quality_scores(ds, col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(lambda t: quality_batch(t, col, id_col),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# language ID (stopword-profile heuristic)
# ---------------------------------------------------------------------------

_LANG_PROFILES: dict[str, set] = {
    "en": set("the and of to in is was for on with that this be are at by "
              "not from he she it they you we have has had will would".split()),
    "de": set("der die das und ist von zu mit den dem ein eine nicht auf "
              "für als auch sich des im war sind wird bei aus nach".split()),
    "fr": set("le la les et de des du un une est dans que pour sur avec ne "
              "pas au aux ce cette il elle nous vous sont était".split()),
    "es": set("el la los las y de del un una es en que por para con no se "
              "al lo su sus como más pero fue son está".split()),
}


class LanguageId:
    """Actor-pool stage: profiles compiled once per actor."""

    def __init__(self, col: str = "text", id_col: str = "doc_id"):
        self.col, self.id_col = col, id_col
        self.langs = sorted(_LANG_PROFILES)
        self.profiles = [_LANG_PROFILES[lg] for lg in self.langs]

    def __call__(self, t: pa.Table, tok: dict | None = None) -> pa.Table:
        if tok is None:
            tok = tokenize_column(
                t.column(self.col).combine_chunks()
                if isinstance(t.column(self.col), pa.ChunkedArray)
                else t.column(self.col), get_analyzer("default"))
        n = t.num_rows
        scores = np.zeros((n, len(self.langs)), np.float64)
        if len(tok["row"]):
            for li, prof in enumerate(self.profiles):
                vhit = np.isin(tok["vocab"], list(prof)).astype(np.float64)
                scores[:, li] = np.bincount(
                    tok["row"], weights=vhit[tok["codes"]], minlength=n)
        totals = np.maximum(tok["row_token_counts"].astype(np.float64), 1.0)
        ratios = scores / totals[:, None]
        best = np.argmax(ratios, axis=1)
        conf = ratios[np.arange(n), best]
        pred = np.where(conf > 0.02,
                        np.array(self.langs, object)[best], "und")
        # explicit string type: an empty batch would infer Arrow null
        return pa.table({self.id_col: t.column(self.id_col),
                         "lang_pred": pa.array(pred.astype(object),
                                               type=pa.string()),
                         "lang_conf": pa.array(_round6(conf))})


def language_id(ds, col: str = "text", id_col: str = "doc_id",
                concurrency: int = 4):
    return ds.map_batches(LanguageId,
                          fn_constructor_kwargs=dict(col=col, id_col=id_col),
                          batch_format="pyarrow",
                          concurrency=(1, concurrency), num_cpus=1)


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1099511628211)      # FNV-style rolling base
_FP_OFFSET = np.uint64(14695981039346656037)


def rolling_fingerprint(text: str | None) -> int:
    """Deterministic 64-bit rolling (FNV-1a) hash over utf-8 bytes.

    A SEPARATE hash family from ``fingerprint_batch``'s fp64 (keyed
    siphash) — the two are NOT interchangeable: never mix this with
    fp64 columns in a dedup/join, the values will never agree. Kept
    only as an incremental/streaming-friendly reference (FNV folds one
    byte at a time); the batch path is vectorized siphash because a
    per-byte Python loop caps at ~1 MB/s/core. Returns 0 for
    null/empty input."""
    if not text:
        return 0
    h = _FP_OFFSET
    for b in text.encode():
        h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def fingerprint_batch(t: pa.Table, col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """(id, md5 hex, fp64) — md5 is the content-address (oracle-checked);
    fp64 is a fast 64-bit keyed siphash computed at column level
    (``pd.util.hash_array``: one C pass per string, >100 MB/s/core),
    with 0 reserved for null/empty (note: ``scalars.string_fingerprint``
    zeroes only NULL — empty strings hash there)."""
    text = t.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    texts = text.to_pylist()
    md5s = [hashlib.md5((x or "").encode()).hexdigest() for x in texts]
    clean = pc.fill_null(text, "")
    # pandas siphash reads object strings as C strings (truncates at the
    # first NUL) — map \x00 -> U+FFFD first, same as exact_dedup_keys,
    # so texts differing after an embedded NUL don't collide
    vals = np.asarray(pc.replace_substring(
        clean, "\x00", "\N{REPLACEMENT CHARACTER}").to_numpy(
        zero_copy_only=False), object)
    fp = pd.util.hash_array(vals).astype(np.uint64)
    fp[fp == 0] = 1  # keep 0 exclusively for null/empty (2^-64 per doc,
    #                  reachable at corpus scale; string_fingerprint does
    #                  the same remap)
    empty = np.asarray(pc.equal(clean, "").to_numpy(zero_copy_only=False),
                       bool)
    fp[empty] = 0
    return pa.table({id_col: t.column(id_col),
                     "md5": pa.array(md5s, pa.string()),
                     "fp64": pa.array(fp, pa.uint64())})


def fingerprints(ds, col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(lambda t: fingerprint_batch(t, col, id_col),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# repetition signals (Gopher-rule style: duplicate-word / duplicate-2gram
# fractions and top-item shares — the published web-text repetition
# filters, adapted to whitespace words)
# ---------------------------------------------------------------------------

def repetition_batch(t: pa.Table, col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """(id, n_words, dup_word_frac, top_word_frac, dup_2gram_frac,
    top_2gram_frac) per doc, all vectorized.

    ``dup_*_frac`` = 1 - distinct/total (the mass in repeats);
    ``top_*_frac`` = share of the single most frequent item. Docs with
    no words (or no 2-grams) score 0.0 — short docs are judged by the
    length signals in ``quality_batch``, not here."""
    c = t.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    n = t.num_rows
    lists = pc.split_pattern_regex(c, pattern=r"\s+")
    flat = pc.list_flatten(lists)
    parents = np.asarray(pc.list_parent_indices(lists)
                         .to_numpy(zero_copy_only=False), np.int64)
    keep = np.asarray(pc.binary_length(flat)
                      .to_numpy(zero_copy_only=False), np.int64) > 0
    parents = parents[keep]
    enc = flat.filter(pa.array(keep)).dictionary_encode()
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
    v = np.int64(max(len(enc.dictionary), 1))
    nw = np.bincount(parents, minlength=n).astype(np.int64)

    def _distinct_top(doc: np.ndarray, key: np.ndarray,
                      total: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per-doc (dup_frac, top_frac) from (doc, key) occurrence pairs
        — one lexsort + run-length scan, no per-doc Python."""
        distinct = np.zeros(n, np.int64)
        top = np.zeros(n, np.int64)
        if len(doc):
            order = np.lexsort((key, doc))
            d_s, k_s = doc[order], key[order]
            new = np.empty(len(order), bool)
            new[0] = True
            new[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
            starts = np.flatnonzero(new)
            rc = np.diff(np.append(starts, len(order)))
            rd = d_s[starts]
            distinct = np.bincount(rd, minlength=n).astype(np.int64)
            np.maximum.at(top, rd, rc)
        ok = total > 0
        dup = np.zeros(n, np.float64)
        tf = np.zeros(n, np.float64)
        dup[ok] = 1.0 - distinct[ok] / total[ok]
        tf[ok] = top[ok] / total[ok]
        return _round6(dup), _round6(tf)

    dup_w, top_w = _distinct_top(parents, codes, nw)
    # 2-grams: adjacent word pairs within one doc
    same = parents[1:] == parents[:-1] if len(parents) else \
        np.empty(0, bool)
    gdoc = parents[1:][same] if len(parents) else np.empty(0, np.int64)
    gkey = (codes[:-1][same] * v + codes[1:][same]) if len(parents) \
        else np.empty(0, np.int64)
    ng = np.bincount(gdoc, minlength=n).astype(np.int64)
    dup_g, top_g = _distinct_top(gdoc, gkey, ng)
    return pa.table({id_col: t.column(id_col),
                     "n_words": pa.array(nw),
                     "dup_word_frac": pa.array(dup_w),
                     "top_word_frac": pa.array(top_w),
                     "dup_2gram_frac": pa.array(dup_g),
                     "top_2gram_frac": pa.array(top_g)})


def repetition_stats(ds, col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(lambda t: repetition_batch(t, col, id_col),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus vocabulary (top-k terms) — tokenizer/BPE training prep
# ---------------------------------------------------------------------------

def vocab_counts(ds, col: str = "text", *, analyzer: str = "default",
                 ngram: int = 1):
    """Corpus-wide term frequencies -> Dataset of ``(term, cnt)``.

    Map-side COMBINER: each batch emits its per-batch (term, count)
    partials — rows proportional to the batch VOCABULARY, not its token
    count (``tokenize_column`` dictionary-encodes, so per-token Python
    strings never exist) — and ``groupby(term).sum`` is the only
    shuffle. ``ngram=2`` counts adjacent in-document word pairs
    (``"a b"`` keys), the unit BPE-style merge scoring works on."""
    if ngram not in (1, 2):
        raise ValueError("vocab_counts: ngram must be 1 or 2")
    an = get_analyzer(analyzer)

    def partial(t: pa.Table) -> pa.Table:
        c = t.column(col)
        tok = tokenize_column(c.combine_chunks()
                              if isinstance(c, pa.ChunkedArray) else c, an,
                              include_tokens=False)
        codes, row, vocab = tok["codes"], tok["row"], tok["vocab"]
        if ngram == 1:
            u, cnt = np.unique(codes, return_counts=True) if len(codes) \
                else (np.empty(0, np.int64), np.empty(0, np.int64))
            terms = vocab[u] if len(u) else np.empty(0, object)
        else:
            # adjacency = same doc AND consecutive POSITIONS — a
            # RemoveLongFilter-dropped token must not make its two
            # neighbours a pair that never existed in the document
            pos = tok["position"]
            same = ((row[1:] == row[:-1]) & (pos[1:] == pos[:-1] + 1)) \
                if len(row) else np.empty(0, bool)
            a = codes[:-1][same] if len(row) else np.empty(0, np.int64)
            b = codes[1:][same] if len(row) else np.empty(0, np.int64)
            # batch vocab is far below 2^31 (a batch can't hold more
            # distinct tokens than characters) — but fail LOUDLY if that
            # ever breaks rather than silently aliasing packed pairs
            # (a real raise, not an assert: workers may run under -O)
            if len(codes) and codes.max() >= (1 << 31):
                raise ValueError(
                    "vocab_counts: batch vocabulary exceeds 2^31 codes")
            packed = (a.astype(np.int64) << np.int64(32)) | b.astype(
                np.int64)
            u, cnt = np.unique(packed, return_counts=True) if len(packed) \
                else (np.empty(0, np.int64), np.empty(0, np.int64))
            if len(u):
                # rows ~ the batch's bigram VOCABULARY (already uniqued);
                # join the two gathered vocab arrays in one Arrow kernel
                import pyarrow.compute as _pc
                terms = _pc.binary_join_element_wise(
                    pa.array(vocab[(u >> np.int64(32)).astype(np.int64)],
                             pa.string()),
                    pa.array(vocab[(u & np.int64(0xFFFFFFFF)).astype(
                        np.int64)], pa.string()),
                    " ")
            else:
                terms = np.empty(0, object)
        if not isinstance(terms, pa.Array):
            terms = pa.array(terms, pa.string())
        return pa.table({"term": terms,
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("term").sum("cnt"))
    return agg.map_batches(
        lambda t: t.rename_columns(["term", "cnt"]),
        batch_format="pyarrow")


def vocab_topk(ds, col: str = "text", *, k: int = 100,
               analyzer: str = "default", ngram: int = 1) -> pd.DataFrame:
    """Top-``k`` corpus terms by frequency (count desc, term asc) —
    per-block partial top-k after the combiner aggregation; only
    ``k x blocks`` rows reach the driver."""
    from tantivy4java_ray.functions.topk import topk
    agg = vocab_counts(ds, col, analyzer=analyzer, ngram=ngram)
    out = topk(agg, "cnt", k, descending=True, tie_cols=("term",))
    if not len(out):
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             "cnt": pd.Series(dtype=np.int64)})
    return out[["term", "cnt"]]


# ---------------------------------------------------------------------------
# unigram language-model scoring (KenLM-style quality signal, no LM dep)
# ---------------------------------------------------------------------------

def unigram_logprob(ds, col: str = "text", id_col: str = "doc_id", *,
                    smoothing: float = 1.0, analyzer: str = "default",
                    counts=None):
    """Score every doc by its mean token log-probability under an
    add-``smoothing`` corpus unigram model — the classic cheap stand-in
    for a KenLM perplexity filter (docs far from the corpus distribution
    score low). -> Dataset of ``(id, n_tokens, logprob_mean,
    perplexity)``; empty/null docs get ``logprob_mean = 0`` and
    ``perplexity = 1`` (no evidence either way).

    ``p(tok) = (c_tok + a) / (T + a * V)`` with T total corpus tokens
    and V the corpus vocabulary size; ``counts`` optionally supplies a
    DIFFERENT corpus's ``(term, cnt)`` table (held-out scoring) — OOV
    tokens then get the smoothing floor ``a / (T + a * V)``.

    Scale: pass 1 is ``vocab_counts``' combiner aggregation (shuffle
    rows ~ vocabulary); the model — one float per vocab entry — is
    broadcast ONCE via ``ray.put`` and pass 2 is map-only. Per-batch
    scoring is a dictionary-encode + one searchsorted against the
    broadcast vocab + a bincount-weighted mean: no per-token Python."""
    import ray

    if smoothing <= 0:
        raise ValueError("unigram_logprob: smoothing must be > 0")
    src = counts if counts is not None else vocab_counts(
        ds, col, analyzer=analyzer)
    cdf = src if isinstance(src, pd.DataFrame) else src.to_pandas()
    terms = cdf["term"].to_numpy(object)
    cnt = cdf["cnt"].to_numpy(np.float64)
    order = np.argsort(terms)
    terms, cnt = terms[order], cnt[order]
    T = float(cnt.sum())
    V = float(len(terms))
    denom = np.log(T + smoothing * max(V, 1.0))
    logp = np.log(cnt + smoothing) - denom
    floor = np.log(smoothing) - denom
    ref = ray.put((terms, logp))
    an = get_analyzer(analyzer)

    def score(t: pa.Table) -> pa.Table:
        terms, logp = ray.get(ref)          # zero-copy from plasma
        tok = tokenize_column(t.column(col), an,
                              include_tokens=False)
        n = t.num_rows
        n_tok = tok["row_token_counts"].astype(np.float64)
        sums = np.zeros(n, np.float64)
        if len(tok["row"]):
            if len(terms):
                # model lookup once per DISTINCT batch term, then gather
                vpos = np.searchsorted(terms, tok["vocab"])
                ok = vpos < len(terms)
                hit = np.zeros(len(tok["vocab"]), bool)
                hit[ok] = terms[vpos[ok]] == tok["vocab"][ok]
                vlp = np.where(hit,
                               logp[np.minimum(vpos, len(terms) - 1)],
                               floor)
            else:   # empty held-out model: every token gets the floor
                vlp = np.full(len(tok["vocab"]), floor)
            sums = np.bincount(tok["row"], weights=vlp[tok["codes"]],
                               minlength=n)
        mean = np.where(n_tok > 0, sums / np.maximum(n_tok, 1.0), 0.0)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "logprob_mean": pa.array(_round6_signed(mean)),
            "perplexity": pa.array(_round6(np.exp(-mean)))})

    return ds.map_batches(score, batch_format="pyarrow")


def _round6_signed(x: np.ndarray) -> np.ndarray:
    """SQL ROUND (half away from zero) for signed values — the log
    probabilities are negative; `_round6` assumes non-negative."""
    x = np.asarray(x, np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# document chunking (context-window training prep)
# ---------------------------------------------------------------------------

def chunk_batch(t: pa.Table, col: str, id_col: str,
                max_tokens: int, overlap: int) -> pa.Table:
    """Split each doc into overlapping windows of <= ``max_tokens``
    whitespace tokens -> ``(id, chunk_idx, chunk, n_tokens)`` rows.
    Stride = max_tokens - overlap; the last window ends at the doc's
    final token (it may be shorter). Chunks join with a single space
    (training-prep normalization, same whitespace tokenization as
    ``decontaminate``). Fully vectorized: one regex split, then the
    chunk windows are built as ONE ListArray over the flat token
    array + ``binary_join`` — no per-doc Python."""
    stride = max_tokens - overlap
    if max_tokens < 1 or not (0 < stride <= max_tokens):
        raise ValueError("chunk_batch: need max_tokens >= 1 and "
                         "0 <= overlap < max_tokens")
    c = t.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    lists = pc.split_pattern_regex(c, r"\s+")
    flat = pc.list_flatten(lists)
    parents = np.asarray(pc.list_parent_indices(lists)
                         .to_numpy(zero_copy_only=False), np.int64)
    keep = np.asarray(pc.binary_length(flat)
                      .to_numpy(zero_copy_only=False), np.int64) > 0
    flat = flat.filter(pa.array(keep))
    parents = parents[keep]
    n_rows = t.num_rows
    n_tok = np.bincount(parents, minlength=n_rows).astype(np.int64)
    row_off = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    # chunks per row: 0 for empty docs, else 1 + ceil((n - max)/stride)
    extra = np.maximum(n_tok - max_tokens, 0)
    n_chunks = np.where(n_tok == 0, 0,
                        1 + (extra + stride - 1) // stride)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table({id_col: pa.array([], t.column(id_col).type),
                         "chunk_idx": pa.array([], pa.int64()),
                         "chunk": pa.array([], pa.string()),
                         "n_tokens": pa.array([], pa.int64())})
    doc_of = np.repeat(np.arange(n_rows), n_chunks)
    cum0 = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    idx = np.arange(total, dtype=np.int64) - np.repeat(cum0, n_chunks)
    starts = idx * stride
    ends = np.minimum(starts + max_tokens, n_tok[doc_of])
    lens = ends - starts
    abs_start = row_off[doc_of] + starts
    # gather indices for all chunk windows in one take
    coff = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    gather = (np.arange(int(coff[-1]), dtype=np.int64)
              - np.repeat(coff[:-1], lens) + np.repeat(abs_start, lens))
    toks = flat.take(pa.array(gather))
    if coff[-1] < 2**31:
        chunk_lists = pa.ListArray.from_arrays(
            pa.array(coff, pa.int32()), toks)
    else:
        chunk_lists = pa.LargeListArray.from_arrays(
            pa.array(coff, pa.int64()), toks)
    chunks = pc.binary_join(chunk_lists, " ")
    return pa.table({id_col: t.column(id_col).take(pa.array(doc_of)),
                     "chunk_idx": pa.array(idx, pa.int64()),
                     "chunk": chunks,
                     "n_tokens": pa.array(lens, pa.int64())})


def doc_chunks(ds, col: str = "text", id_col: str = "doc_id", *,
               max_tokens: int = 512, overlap: int = 0):
    """Context-window chunking of a corpus (map-only, zero shuffle);
    see ``chunk_batch``."""
    return ds.map_batches(
        lambda t: chunk_batch(t, col, id_col, max_tokens, overlap),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII redaction (Dolma/C4-style email/phone/IP masking)
# ---------------------------------------------------------------------------

#: RE2-compatible patterns (pyarrow's replace_substring_regex is RE2, so
#: no lookarounds; DuckDB's regexp_replace is also RE2 — the SQL oracle
#: runs the IDENTICAL patterns). Order matters: emails first (their
#: domains would otherwise partially match the phone pattern's digits).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[ .\-]?\(?\d{2,4}\)?[ .\-]?\d{3,4}[ .\-]?"
              r"\d{3,4}\b", "<PHONE>"),
)


def redact_pii_batch(t: pa.Table, col: str = "text",
                     id_col: str = "doc_id",
                     kinds: tuple[str, ...] = ("email", "ipv4", "phone")
                     ) -> pa.Table:
    """Mask emails / IPv4 addresses / phone numbers with typed tokens
    and count the replacements per kind — the Dolma/C4-style PII
    scrub. Fully vectorized: one ``count_substring_regex`` + one
    ``replace_substring_regex`` per kind per batch; null text
    normalizes to ``''``."""
    text = t.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    cols: dict = {id_col: t.column(id_col)}
    counts = {}
    for kind, pat, token in PII_PATTERNS:
        if kind not in kinds:
            continue
        counts[kind] = pc.count_substring_regex(text, pat)
        text = pc.replace_substring_regex(text, pat, token)
    cols[col] = text
    for kind, c in counts.items():
        cols[f"n_{kind}"] = c.cast(pa.int64())
    return pa.table(cols)


def redact_pii(ds, col: str = "text", id_col: str = "doc_id",
               kinds: tuple[str, ...] = ("email", "ipv4", "phone")):
    """Map-only PII scrub -> Dataset of ``(id, redacted text,
    n_email, n_ipv4, n_phone)``. Zero shuffle; the patterns ride the
    closure (tiny, RE2-precompiled inside Arrow per batch)."""
    return ds.map_batches(
        lambda t: redact_pii_batch(t, col, id_col, kinds),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# text normalization (curation pre-step)
# ---------------------------------------------------------------------------

def normalize_text_batch(t: pa.Table, col: str = "text",
                         id_col: str = "doc_id", *,
                         form: str = "NFC") -> pa.Table:
    """Curation-standard text normalization: Unicode ``form`` (NFC by
    default), control characters stripped (except \\n and \\t),
    horizontal whitespace runs collapsed to one space, blank-run
    newlines collapsed, and edges trimmed. Vectorized: one
    ``utf8_normalize`` + three RE2 passes per batch; null -> ``''``."""
    import unicodedata
    text = t.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    # Unicode normalization: ASCII rows are fixed points under every
    # form, so only non-ASCII rows pay the per-row unicodedata cost
    # (this Arrow build's utf8_normalize does not COMPOSE — verified:
    # NFC of 'e'+U+0301 stays decomposed — so it cannot be used)
    non_ascii = pc.match_substring_regex(text, r"[^\x00-\x7F]")
    hit = np.flatnonzero(np.asarray(
        non_ascii.to_numpy(zero_copy_only=False), bool))
    if len(hit):
        fixed = pa.array(
            [unicodedata.normalize(form, v)
             for v in text.take(pa.array(hit)).to_pylist()],
            text.type)
        text = pc.replace_with_mask(text, non_ascii, fixed)
    # strip C0/C1 controls except \n and \t
    text = pc.replace_substring_regex(
        text, r"[\x00-\x08\x0B-\x1F\x7F]", "")
    text = pc.replace_substring_regex(text, r"[ \t]+", " ")
    text = pc.replace_substring_regex(text, r" ?\n ?", "\n")
    text = pc.replace_substring_regex(text, r"\n{3,}", "\n\n")
    text = pc.utf8_trim_whitespace(text)
    return pa.table({id_col: t.column(id_col), col: text})


def normalize_text(ds, col: str = "text", id_col: str = "doc_id", *,
                   form: str = "NFC"):
    """Map-only normalization pass -> Dataset of ``(id, text)``."""
    return ds.map_batches(
        lambda t: normalize_text_batch(t, col, id_col, form=form),
        batch_format="pyarrow")
