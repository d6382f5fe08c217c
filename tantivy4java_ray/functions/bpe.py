"""BPE tokenizer training + encoding over a Ray corpus (Sennrich et
al. 2016, arXiv:1508.07909 — public algorithm).

Scale shape: the corpus-sized work is ONE ``vocab_counts`` aggregation
(combiner partials, shuffle rows ~ vocabulary); the merge loop then
runs on the DRIVER over that small word-frequency table — the standard
BPE formulation trains on word counts, not the raw corpus, so this is
the correct distribution boundary (a 100 TB corpus still aggregates to
a few-million-row word table). Encoding is a ``map_batches`` stage
whose per-word merge work is cached per DISTINCT word (the tokenizer
dictionary-encodes, so cost is vocabulary-bounded, not token-bounded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tantivy4java_ray.analyzer import get_analyzer, tokenize_column
from tantivy4java_ray.functions.textstats import _round6, vocab_counts

END = "</w>"


def train_bpe_from_counts(words, counts, *, num_merges: int,
                          min_pair_count: int = 2,
                          end_token: str = END) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table.

    -> ordered merge list. Deterministic: highest pair count wins, ties
    break to the lexicographically smallest pair. Incremental pair-count
    maintenance (only words CONTAINING the merged pair are touched per
    step) — the full-recount reference in tests pins its correctness."""
    vocab: list[list[str]] = [list(w) + [end_token] for w in words]
    freq = [int(c) for c in counts]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word(wi: int, sign: int) -> None:
        syms = vocab[wi]
        c = freq[wi] * sign
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + c
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(vocab)):
        add_word(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        best_c = min_pair_count - 1
        for p, c in pair_counts.items():
            if c > best_c or (c == best_c and best is not None
                              and p < best):
                best, best_c = p, c
        if best is None:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms = vocab[wi]
            add_word(wi, -1)                 # retract old contributions
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[wi] = out
            add_word(wi, +1)
        # drop emptied entries so the argmax scan stays tight
        pair_counts = {p: c for p, c in pair_counts.items() if c > 0}
        pair_words = {p: ws for p, ws in pair_words.items()
                      if p in pair_counts}
    return merges


def train_bpe(ds, col: str = "text", *, num_merges: int = 1000,
              analyzer: str = "default",
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge learning."""
    wc = vocab_counts(ds, col, analyzer=analyzer).to_pandas()
    if not len(wc):
        return []
    wc = wc.sort_values("term").reset_index(drop=True)   # deterministic
    return train_bpe_from_counts(wc["term"].tolist(),
                                 wc["cnt"].tolist(),
                                 num_merges=num_merges,
                                 min_pair_count=min_pair_count)


class BpeTokenizer:
    """Actor-pool encode stage: merge ranks built once per actor in
    ``__init__``; ``__call__`` emits ``(id, n_tokens, n_bpe_tokens,
    compression)`` per doc (compression = bpe tokens per word token —
    the number a tokenizer-budget planner needs). Per-word merge work
    is memoised across batches (actor-lifetime cache keyed by the
    distinct word)."""

    def __init__(self, merges, col: str = "text",
                 id_col: str = "doc_id", analyzer: str = "default",
                 end_token: str = END):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.col, self.id_col = col, id_col
        self.an = get_analyzer(analyzer)
        self.end = end_token
        self._cache: dict[str, int] = {}

    def encode_word(self, w: str) -> list[str]:
        syms = list(w) + [self.end]
        ranks = self.ranks
        while len(syms) > 1:
            best_i, best_r = -1, len(ranks)
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and r < best_r:
                    best_i, best_r = i, r
            if best_i < 0:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def _pieces_per_word(self, w: str) -> int:
        n = self._cache.get(w)
        if n is None:
            n = self._cache[w] = len(self.encode_word(w))
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        tok = tokenize_column(t.column(self.col), self.an,
                              include_tokens=False)
        n = t.num_rows
        n_tok = tok["row_token_counts"].astype(np.int64)
        bpe = np.zeros(n, np.int64)
        if len(tok["row"]):
            per_word = np.fromiter(
                (self._pieces_per_word(w) for w in tok["vocab"]),
                np.int64, len(tok["vocab"]))
            bpe = np.bincount(tok["row"],
                              weights=per_word[tok["codes"]].astype(
                                  np.float64),
                              minlength=n).astype(np.int64)
        comp = np.where(n_tok > 0, bpe / np.maximum(n_tok, 1), 0.0)
        return pa.table({
            self.id_col: t.column(self.id_col),
            "n_tokens": pa.array(n_tok),
            "n_bpe_tokens": pa.array(bpe),
            "compression": pa.array(_round6(comp))})


def bpe_token_counts(ds, merges, col: str = "text",
                     id_col: str = "doc_id", *,
                     analyzer: str = "default", concurrency: int = 4):
    """Corpus pass with a trained merge list -> Dataset of
    ``(id, n_tokens, n_bpe_tokens, compression)``."""
    return ds.map_batches(
        BpeTokenizer, batch_format="pyarrow",
        concurrency=(1, concurrency),   # autoscale: never starve the read
        fn_constructor_kwargs=dict(merges=merges, col=col,
                                   id_col=id_col, analyzer=analyzer))
