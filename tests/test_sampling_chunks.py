"""Deterministic sampling (domain mixing) and context-window chunking —
determinism under repartitioning, rate accuracy, DuckDB differentials,
and chunk-coverage invariants."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tantivy4java_ray.functions.sampling import (sample_deterministic,
                                                 sample_stratified)
from tantivy4java_ray.functions.textstats import chunk_batch, doc_chunks


def _docs(n=2000, seed=4):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], n, p=[0.6, 0.25, 0.15]),
        "text": [" ".join(f"w{j}" for j in rng.integers(0, 50,
                                                        rng.integers(0, 90)))
                 for _ in range(n)]})


def _ids(out):
    df = out.to_pandas()
    return sorted(df["doc_id"].tolist()) if "doc_id" in df.columns else []


def test_sample_invariant_under_partitioning(ray_session):
    import ray.data
    df = _docs()
    a = _ids(sample_deterministic(ray.data.from_pandas(df), "doc_id", 0.3))
    b = _ids(sample_deterministic(
        ray.data.from_pandas(df).repartition(13), "doc_id", 0.3))
    assert a == b and len(a) > 0
    # rate within a few sigma of the target
    assert abs(len(a) / len(df) - 0.3) < 0.05


def test_stratified_rates_and_default(ray_session):
    import ray.data
    df = _docs()
    out = sample_stratified(ray.data.from_pandas(df), "doc_id", "lang",
                            {"en": 0.5, "de": 1.0}).to_pandas()
    got = out.groupby("lang").size()
    n = df.groupby("lang").size()
    assert got.get("fr", 0) == 0                       # default 0
    assert got["de"] == n["de"]                        # frac 1.0 = all
    assert abs(got["en"] / n["en"] - 0.5) < 0.06
    # membership is per-row: the en sample is a subset of full-corpus 0.5
    full = sample_deterministic(
        ray.data.from_pandas(df), "doc_id", 0.5).to_pandas()
    assert set(out[out.lang == "en"].doc_id) <= set(full.doc_id)


def test_stratified_duckdb_differential(ray_session):
    import ray.data
    df = _docs(seed=8)
    got = sample_stratified(ray.data.from_pandas(df).repartition(7),
                            "doc_id", "lang",
                            {"en": 0.25, "fr": 0.75},
                            default_frac=0.1).to_pandas()
    con = duckdb.connect()
    con.register("d", df)
    from tantivy4java_ray.functions.sampling import frac_threshold
    t_en, t_fr, t_def = (frac_threshold(f) for f in (0.25, 0.75, 0.1))
    want = con.sql(f"""
        SELECT doc_id FROM d
        WHERE (doc_id::HUGEINT * 2654435761) % 4294967296
              < CASE lang WHEN 'en' THEN {t_en} WHEN 'fr' THEN {t_fr}
                          ELSE {t_def} END
        ORDER BY doc_id""").df()["doc_id"].tolist()
    assert sorted(got["doc_id"].tolist()) == want


def test_boundary_key_matches_oracle(ray_session):
    """key 283095145 hashes EXACTLY to floor(0.1 * 2^32): the integer-
    threshold contract drops it on both sides (the old frac*2^32 double
    comparison in SQL kept it while the engine dropped it)."""
    import ray.data
    from tantivy4java_ray.functions.sampling import frac_threshold
    k = 283095145
    assert (k * 2654435761) % (1 << 32) == frac_threshold(0.1)
    df = pd.DataFrame({"doc_id": np.asarray([k, 0], np.int64)})
    got = _ids(sample_deterministic(ray.data.from_pandas(df),
                                    "doc_id", 0.1))
    assert k not in got   # u < thr is strict
    con = duckdb.connect()
    con.register("d", df)
    want = con.sql(f"""
        SELECT doc_id FROM d
        WHERE (doc_id::HUGEINT * 2654435761) % 4294967296
              < {frac_threshold(0.1)}""").df()["doc_id"].tolist()
    assert got == sorted(want)


def test_negative_keys_refused(ray_session):
    import ray.data
    df = pd.DataFrame({"doc_id": np.asarray([-1, 2], np.int64)})
    with pytest.raises(Exception, match="nonnegative"):
        sample_deterministic(ray.data.from_pandas(df), "doc_id",
                             0.5).to_pandas()


def test_chunk_hand_oracle():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a b c d e", "x", None])})
    out = chunk_batch(t, "text", "doc_id", 2, 1).to_pydict()
    assert out["chunk"] == ["a b", "b c", "c d", "d e", "x"]
    assert out["doc_id"] == [1, 1, 1, 1, 2]
    assert out["chunk_idx"] == [0, 1, 2, 3, 0]
    assert out["n_tokens"] == [2, 2, 2, 2, 1]


def test_chunk_coverage_invariants(ray_session):
    """Every token of every doc is covered; consecutive chunks overlap
    by exactly `overlap` except the final (clamped) one; reassembling
    non-overlapped spans reproduces the normalized doc."""
    import ray.data
    df = _docs(n=300, seed=6)
    out = doc_chunks(ray.data.from_pandas(df), max_tokens=16,
                     overlap=4).to_pandas()
    norm = {r.doc_id: " ".join(r.text.split()) for r in df.itertuples()
            if r.text.strip()}
    rebuilt = {}
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        toks = []
        for _, r in g.iterrows():
            ct = r["chunk"].split(" ")
            assert len(ct) == r["n_tokens"] <= 16
            start = int(r["chunk_idx"]) * 12
            toks = toks[:start] + ct
        rebuilt[doc_id] = " ".join(toks)
    assert rebuilt == norm
    # empty docs emit nothing
    empties = {r.doc_id for r in df.itertuples() if not r.text.strip()}
    assert empties.isdisjoint(set(out["doc_id"]))


def test_chunk_property_vs_naive_model():
    """Hypothesis: chunk_batch == a naive per-doc Python model for
    arbitrary whitespace-laden text and window params."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        texts=st.lists(st.text(alphabet=" \t\nabZ0.", max_size=40),
                       min_size=1, max_size=8),
        max_tokens=st.integers(1, 6),
        overlap_frac=st.floats(0, 0.99),
    )
    def prop(texts, max_tokens, overlap_frac):
        overlap = int(overlap_frac * max_tokens)
        stride = max_tokens - overlap
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        got = chunk_batch(t, "text", "doc_id", max_tokens,
                          overlap).to_pydict()
        want = []
        for i, x in enumerate(texts):
            toks = x.split()
            s = 0
            j = 0
            while toks:
                e = min(s + max_tokens, len(toks))
                want.append((i, j, " ".join(toks[s:e]), e - s))
                if e == len(toks):
                    break
                s += stride
                j += 1
        assert list(zip(got["doc_id"], got["chunk_idx"], got["chunk"],
                        got["n_tokens"])) == want

    prop()


def test_chunk_bad_params():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a"])})
    with pytest.raises(ValueError):
        chunk_batch(t, "text", "doc_id", 4, 4)   # overlap == max
    with pytest.raises(ValueError):
        chunk_batch(t, "text", "doc_id", 0, 0)
