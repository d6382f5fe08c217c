"""Regressions for the similarity/IVF/extract review batch: ragged and
null embedding validation, k=0, empty dataset, IVF rebuild purge,
extract type stability."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from tantivy4java_ray.functions.similarity import (_emb_matrix,
                                                   _tie_exact_topk,
                                                   topk_cosine)


def test_emb_matrix_rejects_ragged_and_null():
    t = pa.table({"embedding": pa.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0], [0.0, 0.0, 1.0, 0.0],
         [1.0, 1.0, 1.0]])})
    with pytest.raises(ValueError, match="ragged"):
        _emb_matrix(t, "embedding")
    t2 = pa.table({"embedding": pa.array([[1.0, 0.0], None],
                                         pa.list_(pa.float64()))})
    with pytest.raises(ValueError, match="null"):
        _emb_matrix(t2, "embedding")


def test_tie_exact_topk_k_zero():
    out = _tie_exact_topk(np.array([0.9, 0.5]), np.array([1, 2]), 0)
    assert len(out) == 0


def test_topk_cosine_k_zero(ray_session):
    df = pd.DataFrame({"vec_id": [0, 1],
                       "embedding": [[1.0, 0.0], [0.0, 1.0]]})
    res = topk_cosine(ray.data.from_pandas(df),
                      np.array([[1.0, 0.0]]), k=0)
    assert len(res) == 0


def test_ivf_rebuild_purges_stale_clusters(ray_session, tmp_path):
    from tantivy4java_ray.functions.ivf import IVFIndex, build_ivf_index
    rng = np.random.default_rng(0)
    def mk(n, base):
        return ray.data.from_pandas(pd.DataFrame({
            "vec_id": np.arange(base, base + n),
            "embedding": list(rng.normal(size=(n, 8)).astype(np.float64))}))
    path = str(tmp_path / "ivf")
    build_ivf_index(mk(200, 0), path, n_clusters=4, sample_size=100)
    # rebuild with a DIFFERENT corpus into the same dir
    ds2 = mk(150, 1000)
    idx = build_ivf_index(ds2, path, n_clusters=4, sample_size=100)
    q = np.asarray(ds2.take(1)[0]["embedding"], np.float32)
    res = idx.search(q[None, :], k=10, nprobe=4)
    ids = res["vec_id"].to_numpy()
    assert (ids >= 1000).all(), f"stale vectors resurfaced: {ids}"
    assert len(ids) == len(set(ids)), "duplicate ids from mixed builds"


def test_fill_text_type_stable():
    from tantivy4java_ray.stages.extract import fill_text_from_html
    txt = pa.array(["a", "b"], pa.large_string())
    html = pa.array([b"<p>x</p>", b"<p>y</p>"], pa.binary())
    out = fill_text_from_html(txt, html)          # no nulls
    assert out.type == pa.string()
    txt2 = pa.array(["a", None], pa.large_string())
    out2 = fill_text_from_html(txt2, html)        # with nulls
    assert out2.type == pa.string()
    assert out2.to_pylist() == ["a", "y"]
