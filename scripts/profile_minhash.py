"""Profile the minhash dedup pipeline at ~10x sf0.1 corpus size to
answer the r4 judge's item #7: is `run_pairs`'s per-duplicate-bucket
Python loop worth a segmented rewrite? Measures (a) end-to-end
minhash_lsh_pairs wall time on a duplicated corpus and (b) the isolated
run_pairs stage over the REAL band table of that corpus, repeated to a
stable per-call number. Verdict recorded in BASELINE.md.

Usage: python scripts/profile_minhash.py [n_docs]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")


def main(n_docs: int = 50_000) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from tantivy4java_ray.functions import dedup as dd

    # corpus with a heavy duplicate load: 30% of docs are near-verbatim
    # copies of a 2% template pool (the regime that stresses run_pairs)
    rng = np.random.default_rng(3)
    n_templates = max(n_docs // 50, 10)
    templates = [" ".join(f"w{x}" for x in rng.integers(0, 5000, 120))
                 for _ in range(n_templates)]
    texts = []
    for i in range(n_docs):
        if rng.random() < 0.30:
            base = templates[int(rng.integers(0, n_templates))].split()
            j = int(rng.integers(0, len(base)))
            base[j] = f"mut{i}"          # one-token mutation: stays near-dup
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(
                f"w{x}" for x in rng.integers(0, 5000, 120)))
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                       "text": texts})

    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(16)
    t0 = time.monotonic()
    pairs = dd.minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.8)
    n_pairs = pairs.count() if hasattr(pairs, "count") else len(pairs)
    total = time.monotonic() - t0
    print(f"minhash_lsh_pairs end-to-end: {total:.2f}s on {n_docs} docs "
          f"({n_pairs} candidate pairs)")

    # isolated run_pairs over the real band table, single process
    mh = dd.MinHasher("text", "doc_id", num_perm=128, bands=16,
                      shingle_size=5)
    sig = mh(pa.Table.from_pandas(df))
    bands = np.stack(sig.column("bands").to_pylist()).astype(np.int64)
    ids = np.asarray(sig.column("doc_id").to_numpy(), np.int64)
    bt = pa.table({
        "band_hash": pa.array(
            np.sort((bands + (np.arange(bands.shape[1]) << 56)).ravel()),
            pa.int64()),
        "doc_id": pa.array(np.tile(ids, bands.shape[1])[
            np.argsort((bands + (np.arange(bands.shape[1]) << 56))
                       .ravel(), kind="stable")], pa.int64())})
    fn = lambda t: dd._run_pairs_block(t, "doc_id", 64)  # noqa: E731
    reps = 5
    t0 = time.monotonic()
    for _ in range(reps):
        fn(bt)
    per = (time.monotonic() - t0) / reps
    print(f"run_pairs stage alone: {per:.3f}s per pass over "
          f"{bt.num_rows} band rows -> {100 * per / total:.1f}% of the "
          f"end-to-end wall")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50_000)
