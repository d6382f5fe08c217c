"""BPE trainer/encoder tests: the incremental-pair-count trainer is
pinned against a naive full-recount reference; the encode stage's
greedy lowest-rank merge loop round-trips and is partitioning-stable."""

import numpy as np
import pandas as pd
import pyarrow as pa

from tantivy4java_ray.functions.bpe import (END, BpeTokenizer,
                                            bpe_token_counts, train_bpe,
                                            train_bpe_from_counts)


def naive_bpe(words, counts, num_merges, min_pair_count=2):
    vocab = {i: tuple(w) + (END,) for i, w in enumerate(words)}
    freq = {i: int(c) for i, c in enumerate(counts)}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for i, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + freq[i]
        pairs = {p: c for p, c in pairs.items() if c >= min_pair_count}
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        joined = best[0] + best[1]
        for i, syms in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if (j + 1 < len(syms) and syms[j] == best[0]
                        and syms[j + 1] == best[1]):
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            vocab[i] = tuple(out)
    return merges


def test_trainer_matches_naive_reference():
    rng = np.random.default_rng(3)
    alphabet = list("abcde")
    for trial in range(15):
        nw = int(rng.integers(3, 30))
        words = ["".join(rng.choice(alphabet,
                                    int(rng.integers(1, 8))))
                 for _ in range(nw)]
        # dedupe (vocab_counts provides distinct terms)
        seen = {}
        for w in words:
            seen[w] = seen.get(w, 0) + int(rng.integers(1, 50))
        ws, cs = list(seen), [seen[w] for w in seen]
        nm = int(rng.integers(1, 25))
        got = train_bpe_from_counts(ws, cs, num_merges=nm)
        want = naive_bpe(ws, cs, nm)
        assert got == want, (trial, ws, cs, nm)


def test_trainer_hand_case():
    # the classic example: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    ws = ["low", "lower", "newest", "widest"]
    cs = [5, 2, 6, 3]
    merges = train_bpe_from_counts(ws, cs, num_merges=4)
    assert merges == naive_bpe(ws, cs, 4)
    # first merge must be the most frequent pair: ('e','s') count 9
    assert merges[0] == ("e", "s")


def test_encoder_round_trip_and_rank_order():
    merges = train_bpe_from_counts(["aaab", "aab"], [10, 5],
                                   num_merges=6)
    tk = BpeTokenizer(merges)
    for w in ("aaab", "aab", "ab", "zzz", "a"):
        pieces = tk.encode_word(w)
        assert "".join(pieces) == w + END       # lossless segmentation
    # a fully-merged training word collapses to one piece
    assert len(tk.encode_word("aaab")) == 1


def test_stage_end_to_end_partition_stable(ray_session):
    import ray.data
    rng = np.random.default_rng(9)
    vocab = ["the", "cat", "concatenation", "tokenizer", "low", "lowest"]
    docs = [" ".join(rng.choice(vocab, int(rng.integers(3, 12))))
            for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": docs})
    ds = ray.data.from_pandas(df)
    merges = train_bpe(ds, "text", num_merges=30)
    assert merges == train_bpe(ds.repartition(7), "text", num_merges=30)
    out = (bpe_token_counts(ds.repartition(5), merges, concurrency=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.shape[0] == 120
    assert (out["n_bpe_tokens"] >= out["n_tokens"]).all()
    # per-doc equality with direct per-word encoding
    tk = BpeTokenizer(merges)
    for i in (0, 17, 119):
        want = sum(len(tk.encode_word(w)) for w in docs[i].split())
        assert out.loc[i, "n_bpe_tokens"] == want


def test_empty_and_null_docs(ray_session):
    import ray.data
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": pd.array(["hello hello", "", None],
                                        dtype="string")})
    ds = ray.data.from_pandas(df)
    merges = train_bpe(ds, "text", num_merges=5)
    out = (bpe_token_counts(ds, merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist()[1:] == [0, 0]
    assert out["n_bpe_tokens"].tolist()[1:] == [0, 0]
    assert out["compression"].tolist()[1:] == [0.0, 0.0]
