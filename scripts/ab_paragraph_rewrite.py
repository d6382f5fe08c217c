"""Interleaved A/B of the paragraph-dedup rewrite kernel on a
high-duplication corpus (>=30% duplicate paragraphs — the real-crawl
regime): A = the round-4 scalar per-touched-doc Python rewrite, B = the
round-5 vectorized split/drop/join kernel (`_drop_paragraphs`). Also
times `decontaminate`'s shingle pass with and without the removed
`to_pylist` round-trip. Results recorded in BASELINE.md.

Usage: python scripts/ab_paragraph_rewrite.py [n_docs]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from tantivy4java_ray.functions.dedup import (_batch_shingle_hashes,
                                              _drop_paragraphs)


def make_corpus(n_docs: int, dup_frac: float = 0.45, seed: int = 7):
    rng = np.random.default_rng(seed)
    pool = [f"boilerplate paragraph number {i} repeated across the crawl"
            for i in range(32)]
    texts, ids, m_id, m_pix = [], [], [], []
    seen = set()
    for i in range(n_docs):
        paras = []
        for j in range(int(rng.integers(2, 9))):
            if rng.random() < dup_frac:
                p = pool[int(rng.integers(0, len(pool)))]
                if p in seen:           # duplicate -> marked for drop
                    m_id.append(i)
                    m_pix.append(j)
                else:
                    seen.add(p)
            else:
                p = f"unique content {i} {j} " + " ".join(
                    str(x) for x in rng.integers(0, 1000, 8))
            paras.append(p)
        texts.append("\n".join(paras))
        ids.append(i)
    order = np.lexsort((np.asarray(m_pix), np.asarray(m_id)))
    return (pa.array(texts, pa.string()), np.asarray(ids, np.int64),
            np.asarray(m_id, np.int64)[order],
            np.asarray(m_pix, np.int64)[order])


def scalar_rewrite(texts, ids, mids, mpix, sep="\n"):
    """The round-4 implementation, verbatim shape: per-touched-doc
    Python split/join with a per-doc set."""
    lo = np.searchsorted(mids, ids, "left")
    hi = np.searchsorted(mids, ids, "right")
    touch = hi > lo
    out = texts.to_pylist()
    for j in np.flatnonzero(touch):
        drops = set(mpix[lo[j]:hi[j]].tolist())
        out[j] = sep.join(p for k, p in enumerate(out[j].split(sep))
                          if k not in drops)
    return pa.array(out, pa.string())


def vector_rewrite(texts, ids, mids, mpix, sep="\n"):
    lo = np.searchsorted(mids, ids, "left")
    hi = np.searchsorted(mids, ids, "right")
    touch = hi > lo
    hit = np.flatnonzero(touch)
    repl = _drop_paragraphs(texts.take(pa.array(hit)), ids[hit],
                            mids, mpix, sep)
    return pa.compute.replace_with_mask(texts, pa.array(touch), repl)


def main(n_docs: int = 100_000) -> None:
    texts, ids, mids, mpix = make_corpus(n_docs)
    n_paras = sum(t.count("\n") + 1 for t in texts.to_pylist())
    touched = len(np.unique(mids))
    print(f"corpus: {n_docs} docs, {n_paras} paragraphs, "
          f"{len(mids)} duplicate paragraphs "
          f"({100 * len(mids) / n_paras:.0f}%), {touched} touched docs "
          f"({100 * touched / n_docs:.0f}%)")
    assert vector_rewrite(texts, ids, mids, mpix).to_pylist() == \
        scalar_rewrite(texts, ids, mids, mpix).to_pylist()

    res = {"scalar": [], "vector": []}
    for _ in range(3):                      # interleaved best-of-3
        for name, fn in (("scalar", scalar_rewrite),
                         ("vector", vector_rewrite)):
            t0 = time.perf_counter()
            fn(texts, ids, mids, mpix)
            res[name].append(time.perf_counter() - t0)
    a, b = min(res["scalar"]), min(res["vector"])
    print(f"rewrite  scalar(r4) {a:.3f}s  vector(r5) {b:.3f}s  "
          f"speedup {a / b:.2f}x")

    # decontaminate shingle pass: to_pylist round-trip vs Arrow column
    res = {"pylist": [], "arrow": []}
    for _ in range(3):
        for name, arg in (("pylist", texts.to_pylist()),
                          ("arrow", texts)):
            t0 = time.perf_counter()
            _batch_shingle_hashes(arg, 13)
            res[name].append(time.perf_counter() - t0)
    a, b = min(res["pylist"]), min(res["arrow"])
    print(f"shingles pylist(r4) {a:.3f}s  arrow(r5) {b:.3f}s  "
          f"speedup {a / b:.2f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000)
