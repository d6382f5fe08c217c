"""Similarity search over an embedding column (``list<float>``).

- ``topk_cosine``: brute-force cosine top-k — the query matrix is put in
  the object store ONCE (``ray.put``) and read zero-copy by every batch
  task (broadcast, never re-shipped per batch); each batch contributes a
  numpy-matmul partial top-k; the driver merges q*k-sized partials.
- ``ivf_topk_cosine``: IVF variant (the scale path): k-means centroids fit
  on a driver-side sample, broadcast; batches prune rows to the probed
  clusters before the matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(t: pa.Table, emb_col: str) -> np.ndarray:
    """(n, dim) float32 matrix from a list<float> column. Validated:
    a blind flatten().reshape(n, -1) silently pairs ids with the WRONG
    vectors on ragged/null rows whenever the flat length divides n."""
    import pyarrow.compute as pc
    col = t.column(emb_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col.type, pa.ExtensionType):
        # Ray Data's ArrowTensorType wraps a (fixed-size) list storage
        col = col.storage
    if col.null_count:
        raise ValueError(
            f"{emb_col!r} has {col.null_count} null embedding rows — "
            f"filter them before similarity search")
    n = len(col)
    if pa.types.is_fixed_size_list(col.type):
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float32)
        return flat.reshape(n, col.type.list_size)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if len(lens) and (lens != lens[0]).any():
        bad = int(np.flatnonzero(lens != lens[0])[0])
        raise ValueError(
            f"{emb_col!r} is ragged: row {bad} has {int(lens[bad])} "
            f"components, expected {int(lens[0])}")
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    return flat.reshape(n, -1)


def _tie_exact_topk(s: np.ndarray, ids: np.ndarray,
                    k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, id asc) with tie-exact
    boundary handling: argpartition alone keeps an ARBITRARY row at
    tied kth-boundary scores, violating the id-asc tie contract for
    duplicate vectors. NaN scores (NaN embedding components) are
    excluded — a row that compares as 'unknown' must never displace a
    real neighbor; may return fewer than k indices."""
    if k <= 0:
        return np.empty(0, np.int64)
    valid = np.flatnonzero(~np.isnan(s))
    if len(valid) > k:
        part = valid[np.argpartition(-s[valid], k - 1)[:k]]
        thresh = s[part].min()
        cand = valid[s[valid] >= thresh]
    else:
        cand = valid
    return cand[np.lexsort((ids[cand], -s[cand]))][:k]


def _merge_partials(partials: pd.DataFrame, id_col: str,
                    k: int) -> pd.DataFrame:
    """Driver merge shared by every similarity surface: per-query
    (score desc, id asc) head-k with a dense rank column — ONE copy of
    the contract (rank dtype, tie order, empty-frame shape)."""
    if "query_id" not in partials.columns:
        # all blocks empty: Ray hands back a column-less frame
        return pd.DataFrame({"query_id": [], "rank": [], id_col: [],
                             "score": []})
    out = []
    for _qi, g in partials.groupby("query_id"):
        g = (g.sort_values(["score", id_col], ascending=[False, True],
                           kind="stable").head(k).reset_index(drop=True))
        g["rank"] = np.arange(len(g), dtype=np.int32)
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        {"query_id": [], id_col: [], "score": [], "rank": []})
    return res[["query_id", "rank", id_col, "score"]]


def _block_topk(t: pa.Table, q: np.ndarray, emb_col: str, id_col: str,
                k: int) -> pa.Table:
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    mat = _normalize(_emb_matrix(t, emb_col))
    sims = q @ mat.T  # (nq, nrows)
    out_q, out_id, out_s = [], [], []
    for qi in range(sims.shape[0]):
        s = sims[qi]
        sel = _tie_exact_topk(s, ids, min(k, len(s)))
        out_q.extend([qi] * len(sel))
        out_id.extend(ids[sel].tolist())
        out_s.extend(s[sel].astype(np.float64).tolist())
    # id column keeps the caller's type (string urls, uuids, ...)
    return pa.table({"query_id": pa.array(out_q, pa.int32()),
                     id_col: pa.array(out_id, t.column(id_col).type),
                     "score": pa.array(out_s, pa.float64())})


def topk_cosine(ds, query_vecs: np.ndarray, *, emb_col: str = "embedding",
                id_col: str = "vec_id", k: int = 10,
                concurrency: int | None = None) -> pd.DataFrame:
    """-> DataFrame (query_id, rank, id, score), cosine desc, id-asc ties.

    Task pool, not actors: the broadcast query matrix crosses the object
    store ONCE (``ray.put``) and each task resolves the ref zero-copy
    from shared memory — actor startup (~1 s/pool) would dominate small
    scans, and at scale tasks read the ref just as cheaply. Only the
    (nq, k)-sized partials return to the driver."""
    import ray
    qref = ray.put(_normalize(np.asarray(query_vecs, np.float32)))

    def block_topk(t: pa.Table) -> pa.Table:
        return _block_topk(t, ray.get(qref), emb_col, id_col, k)

    partials = ds.map_batches(
        block_topk, batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency else {})).to_pandas()
    return _merge_partials(partials, id_col, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the 100TB path
# ---------------------------------------------------------------------------

def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    sample = _normalize(sample.astype(np.float32))
    cents = sample[rng.choice(len(sample), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk_cosine(ds, query_vecs: np.ndarray, *,
                    emb_col: str = "embedding", id_col: str = "vec_id",
                    k: int = 10, n_clusters: int = 16, nprobe: int = 4,
                    sample_size: int = 2000, seed: int = 42,
                    concurrency: int | None = None) -> pd.DataFrame:
    """IVF ANN: centroids from a driver sample, broadcast; each batch prunes
    to rows whose cluster is probed by at least one query."""
    import ray

    # random sample, not limit(): a head sample is ordering-biased
    total = ds.count()
    if total == 0:
        raise ValueError("ivf_topk_cosine: dataset is empty")
    frac = min(1.0, sample_size / total)
    sample_ds = ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    sample_rows = sample_ds.limit(sample_size).to_pandas()
    sample = np.stack(sample_rows[emb_col].to_numpy())
    cents = _kmeans(sample, min(n_clusters, len(sample)), seed=seed)
    q = _normalize(np.asarray(query_vecs, np.float32))
    probe = np.argpartition(-(q @ cents.T), min(nprobe, len(cents)) - 1,
                            axis=1)[:, :nprobe]  # (nq, nprobe)
    probed_set = np.unique(probe)
    cents_ref = ray.put(cents)
    qref = ray.put(q)

    def ivf_block(t: pa.Table) -> pa.Table:
        # task pool: q/cents resolved zero-copy from the object store;
        # probe tables are tiny (nq × nprobe) and ride the closure
        qm, cents = ray.get(qref), ray.get(cents_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(_emb_matrix(t, emb_col))
        assign = np.argmax(mat @ cents.T, axis=1)
        keep = np.isin(assign, probed_set)
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int32()),
                             id_col: pa.array([], t.column(id_col).type),
                             "score": pa.array([], pa.float64())})
        ids, mat, assign = ids[keep], mat[keep], assign[keep]
        sims = qm @ mat.T
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            qkeep = np.isin(assign, probe[qi])
            if not qkeep.any():
                continue
            s = sims[qi][qkeep]
            sel_ids = ids[qkeep]
            # tie-exact + NaN-excluding top-k (see _tie_exact_topk)
            sel = _tie_exact_topk(s, sel_ids, min(k, len(s)))
            out_q.extend([qi] * len(sel))
            out_id.extend(sel_ids[sel].tolist())
            out_s.extend(s[sel].astype(np.float64).tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int32()),
                         id_col: pa.array(out_id, t.column(id_col).type),
                         "score": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(
        ivf_block, batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency else {})).to_pandas()
    return _merge_partials(partials, id_col, k)
