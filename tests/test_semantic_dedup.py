"""SemDeDup-style semantic dedup — hand oracle, blocked-kernel vs naive
all-pairs differential on random clustered data, cluster cap, and the
drop rule's independence from kept status."""

import numpy as np
import pandas as pd
import pytest

from tantivy4java_ray.functions.dedup import semantic_dedup


def _ds(ids, vecs):
    import ray.data
    return ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.asarray(ids, np.int64),
        "embedding": [np.asarray(v, np.float32) for v in vecs]}))


def _run(ds, cents, tau, **kw):
    out = semantic_dedup(ds, "embedding", "vec_id",
                         centroids=cents, tau=tau, **kw).to_pandas()
    return sorted(out["vec_id"].tolist()) if "vec_id" in out.columns else []


def _naive(ids, vecs, cents, tau):
    V = np.asarray(vecs, np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = np.asarray(cents, np.float64)
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    cl = np.argmax(V @ C.T, axis=1)
    order = np.argsort(ids)
    keep = []
    for j in order:
        if not any(cl[i] == cl[j] and ids[i] < ids[j]
                   and float(V[i] @ V[j]) >= tau
                   for i in order):
            keep.append(int(ids[j]))
    return sorted(keep)


def test_hand_oracle(ray_session):
    # two obvious clusters on axes; near-dup planted in cluster 0
    e1, e2 = [1, 0, 0, 0], [0, 1, 0, 0]
    vecs = [e1,                     # id 0 -> cluster 0, kept
            [0.999, 0.04, 0, 0],    # id 1 ~ id 0, cos ~0.999 -> dropped
            e2,                     # id 2 -> cluster 1, kept
            [0, 0, 1, 0]]           # id 3 -> orthogonal, kept
    got = _run(_ds([0, 1, 2, 3], vecs), np.asarray([e1, e2]), 0.9)
    assert got == [0, 2, 3]


def test_drop_rule_ignores_kept_status(ray_session):
    # chain: a~b (>= tau), b~c (>= tau), a!~c. b drops (earlier a);
    # c STILL drops (earlier b exists, kept or not) — the SQL EXISTS rule
    a = np.asarray([1.0, 0.0])
    b = np.asarray([np.cos(0.25), np.sin(0.25)])
    c = np.asarray([np.cos(0.5), np.sin(0.5)])
    tau = float(np.cos(0.3))   # a.b, b.c above; a.c below
    got = _run(_ds([10, 11, 12], [a, b, c]), np.asarray([[1.0, 0.0]]), tau)
    assert got == [10]


def test_blocked_kernel_vs_naive_random(ray_session):
    rng = np.random.default_rng(3)
    # lumpy data: 6 gaussian lumps so real near-dups occur within lumps
    centers = rng.standard_normal((6, 16))
    idx = rng.integers(0, 6, 400)
    vecs = centers[idx] + 0.25 * rng.standard_normal((400, 16))
    ids = rng.permutation(400).astype(np.int64)  # ids not in row order
    cents = centers[:4]  # fewer centroids than lumps: mixed clusters
    tau = 0.97
    got = _run(_ds(ids, vecs).repartition(5), cents, tau)
    assert got == _naive(ids, vecs, cents, tau)


def test_blocked_tiling_boundary(ray_session):
    # force multiple 1024-row tiles in ONE cluster: 2100 copies of two
    # distinct directions; only the first of each direction survives
    n = 2100
    vecs = [[1, 0] if i % 2 == 0 else [0, 1] for i in range(n)]
    got = _run(_ds(np.arange(n), vecs), np.asarray([[1.0, 0.0]]), 0.99,
               max_cluster=10_000)
    assert got == [0, 1]


def test_cluster_cap(ray_session):
    vecs = [[1.0, 0.0]] * 50
    with pytest.raises(Exception, match="max_cluster"):
        _run(_ds(np.arange(50), vecs), np.asarray([[1.0, 0.0]]), 0.9,
             max_cluster=10)
