"""Persisted IVF (inverted-file) ANN index over an embedding column.

``ivf_topk_cosine`` (functions/similarity.py) recomputes cluster
assignments on every query run; this module is the scale path the
round-1 review asked for: assignments are computed ONCE and the vectors
land in cluster-partitioned parquet, so a query reads only its probed
clusters' files —

    build:  sample -> k-means (driver)        # centroids.npy + meta
            map_batches(assign, broadcast)    # ONE assignment pass
            write_parquet(partition_cols=[__cluster])
            (plus a count() and the sampling scan up front — three
            dataset executions total; the assignment+write pass is the
            only one that touches every embedding byte twice)
    query:  probe top-nprobe centroids        # driver, tiny
            read_parquet(<probed dirs only>)  # prunes at the READ
            brute-force cosine top-k inside   # partial top-k per block

The k-means sample uses ``random_sample`` (not ``limit`` — a head
sample is ordering-biased).
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
import pyarrow as pa

from tantivy4java_ray import storage as st
from tantivy4java_ray.functions.similarity import (_emb_matrix, _kmeans,
                                                   _merge_partials,
                                                   _normalize,
                                                   _tie_exact_topk)


def build_ivf_index(ds, out_dir: str, *, emb_col: str = "embedding",
                    id_col: str = "vec_id", n_clusters: int = 64,
                    sample_size: int = 10_000, seed: int = 42,
                    concurrency: int | None = None) -> "IVFIndex":
    import ray

    total = ds.count()
    if total == 0:
        raise ValueError("build_ivf_index: dataset is empty")
    frac = min(1.0, sample_size / total)
    sample_ds = ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    sample = np.stack(sample_ds.limit(sample_size)
                      .to_pandas()[emb_col].to_numpy())
    n_clusters = min(n_clusters, len(sample))
    cents = _kmeans(sample, n_clusters, seed=seed)
    cents_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(t, emb_col))
        a = np.argmax(mat @ ray.get(cents_ref).T, axis=1)
        return t.append_column("__cluster",
                               pa.array(a.astype(np.int32)))

    # purge any prior build's cluster files first: Ray's write_parquet
    # APPENDS uniquely-named files, so a rebuild (or a retry after a
    # crash that died before meta.json landed — the exact state that
    # triggers rebuilds) would mix stale vectors with new ones and
    # search would return duplicates
    data_dir = st.sjoin(out_dir, "data")
    if st.sexists(data_dir):
        st.srmtree(data_dir)
    (ds.map_batches(assign, batch_format="pyarrow",
                    **({"concurrency": concurrency} if concurrency else {}))
       .write_parquet(data_dir, partition_cols=["__cluster"]))
    buf = io.BytesIO()
    np.save(buf, cents)
    st.write_bytes_atomic(buf.getvalue(), st.sjoin(out_dir, "centroids.npy"))
    st.write_json_atomic(st.sjoin(out_dir, "meta.json"),
                         {"emb_col": emb_col, "id_col": id_col,
                          "n_clusters": int(n_clusters),
                          "dim": int(cents.shape[1]), "num_vectors": total})
    return IVFIndex(out_dir)


class IVFIndex:
    """Open a persisted IVF index; queries read only probed clusters."""

    def __init__(self, path: str):
        self.path = path
        self.meta = st.read_json_any(st.sjoin(path, "meta.json"))
        with st.sopen(st.sjoin(path, "centroids.npy"), "rb") as f:
            self.centroids = np.load(f)

    def search(self, query_vecs: np.ndarray, *, k: int = 10,
               nprobe: int = 4, concurrency: int = 4) -> pd.DataFrame:
        """-> (query_id, rank, <id_col>, score) cosine-desc, id-asc ties."""
        import ray
        import ray.data

        emb_col = self.meta["emb_col"]
        id_col = self.meta["id_col"]
        q = _normalize(np.asarray(query_vecs, np.float32))
        nprobe = min(nprobe, len(self.centroids))
        probe = np.argpartition(-(q @ self.centroids.T), nprobe - 1,
                                axis=1)[:, :nprobe]        # (nq, nprobe)
        probed = np.unique(probe)
        files: list[str] = []
        for c in probed.tolist():
            d = st.sjoin(self.path, "data", f"__cluster={c}")
            if st.sexists(d):
                files.extend(st.sjoin(d, f) for f in st.slistdir(d)
                             if f.endswith(".parquet"))
        if not files:
            return pd.DataFrame({"query_id": [], "rank": [], id_col: [],
                                 "score": []})
        # the STORED assignment rides along as the hive partition column
        # (exact — no recomputed-argmax drift, no per-batch matmul)
        sub = ray.data.read_parquet(files,
                                    columns=[id_col, emb_col, "__cluster"])
        qref = ray.put(q)
        probe_ref = ray.put(probe)

        def block(t: pa.Table) -> pa.Table:
            qm = ray.get(qref)
            pm = ray.get(probe_ref)
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            mat = _normalize(_emb_matrix(t, emb_col))
            assign = np.asarray(t.column("__cluster").to_numpy(
                zero_copy_only=False), np.int64)
            sims = qm @ mat.T
            out_q, out_id, out_s = [], [], []
            for qi in range(sims.shape[0]):
                keep = np.isin(assign, pm[qi])
                if not keep.any():
                    continue
                s = sims[qi][keep]
                sel_ids = ids[keep]
                # tie-exact + NaN-excluding top-k (shared contract with
                # brute-force topk_cosine)
                sel = _tie_exact_topk(s, sel_ids, min(k, len(s)))
                out_q.extend([qi] * len(sel))
                out_id.extend(sel_ids[sel].tolist())
                out_s.extend(s[sel].astype(np.float64).tolist())
            # id column keeps the caller's type (string urls, uuids, ...)
            return pa.table({"query_id": pa.array(out_q, pa.int32()),
                             id_col: pa.array(out_id,
                                              t.column(id_col).type),
                             "score": pa.array(out_s, pa.float64())})

        partials = sub.map_batches(block, batch_format="pyarrow",
                                   concurrency=concurrency,
                                   num_cpus=1).to_pandas()
        return _merge_partials(partials, id_col, k)
