"""Exact distributed quantiles / cardinality (functions/quantiles.py).

Differential oracle: DuckDB ``quantile_cont`` / ``COUNT(DISTINCT)`` on
the identical data. The refinement loop is additionally squeezed with
tiny bucket counts and tail thresholds so multi-round narrowing, the
closed-end point bucket, and duplicate-heavy data all actually execute.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from tantivy4java_ray.functions.quantiles import (
    exact_cardinality, exact_order_statistics, exact_quantiles)

PCTS = [0.0, 1.0, 25.0, 50.0, 75.0, 99.0, 100.0]


def _duck_quantiles(vals: np.ndarray, pcts) -> dict[float, float]:
    con = duckdb.connect()
    df = pd.DataFrame({"v": vals})  # noqa: F841 - duckdb reads locals
    qs = ", ".join(f"quantile_cont(v, {p / 100.0})" for p in pcts)
    row = con.execute(f"SELECT {qs} FROM df").fetchone()
    return {p: float(x) for p, x in zip(pcts, row)}


def _check(vals: np.ndarray, ray_session, **kw):
    """Bit-identical to DuckDB quantile_cont: same order statistics,
    same lerp formula (lo*(1-f) + hi*f)."""
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(4)
    got = exact_quantiles(ds, "v", PCTS, **kw)
    duck = _duck_quantiles(vals, PCTS)
    for p in PCTS:
        assert got[p] == duck[p], (p, got[p], duck[p])


def test_quantiles_uniform_match_duckdb(ray_session):
    rng = np.random.default_rng(7)
    _check(rng.uniform(-1000, 1000, 20_000), ray_session)


def test_quantiles_multiround_refinement(ray_session):
    """Small buckets + tiny tail force >= 3 bincount rounds."""
    rng = np.random.default_rng(8)
    vals = rng.normal(0, 1e6, 30_000)
    _check(vals, ray_session, nbuckets=16, tail_threshold=64)


def test_quantiles_duplicate_heavy(ray_session):
    """90% of the mass is 3 exact values: point-bucket / degenerate
    interval paths must resolve, not loop."""
    rng = np.random.default_rng(9)
    vals = np.concatenate([
        np.full(9_000, 42.0), np.full(9_000, -5.0), np.full(9_000, 42.5),
        rng.uniform(-10, 50, 3_000)])
    rng.shuffle(vals)
    _check(vals, ray_session, nbuckets=8, tail_threshold=32)


def test_quantiles_all_identical(ray_session):
    _check(np.full(5_000, 3.25), ray_session, nbuckets=8,
           tail_threshold=16)


def test_quantiles_ulp_narrow_range(ray_session):
    """Values spanning a couple of ulps at large magnitude: linspace
    edges collapse; the unique-edge + point-bucket machinery must still
    terminate with exact answers."""
    base = 1e15
    vals = np.concatenate([
        np.full(4_000, base),
        np.full(4_000, np.nextafter(base, np.inf)),
        np.full(4_000, np.nextafter(np.nextafter(base, np.inf), np.inf)),
    ])
    _check(vals, ray_session, nbuckets=8, tail_threshold=16)


def test_quantiles_nulls_and_nans_excluded(ray_session):
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0] * 100)
    with_junk = pa.table({"v": pa.array(
        list(vals) + [None, float("nan")] * 10, pa.float64())})
    ds = ray.data.from_arrow(with_junk).repartition(3)
    got = exact_quantiles(ds, "v", [50.0], tail_threshold=16, nbuckets=8)
    assert got[50.0] == 3.0


def test_order_statistics_exact_ranks(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.normal(0, 100, 10_000)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(4)
    ks = [0, 1, 4_999, 9_998, 9_999]
    got = exact_order_statistics(ds, "v", ks, nbuckets=32,
                                 tail_threshold=128)
    sv = np.sort(vals)
    for k in ks:
        assert got[k] == sv[k]


def test_order_statistics_rank_out_of_range(ray_session):
    ds = ray.data.from_arrow(pa.table({"v": [1.0, 2.0]}))
    with pytest.raises(ValueError, match="out of range"):
        exact_order_statistics(ds, "v", [2])


def test_exact_cardinality_ints(ray_session):
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 5_000, 60_000)
    ds = ray.data.from_arrow(pa.table({"u": vals})).repartition(5)
    assert exact_cardinality(ds, "u") == len(np.unique(vals))


def test_exact_cardinality_strings_with_nulls(ray_session):
    vals = (["a", "b", "c", None, "a", "b"] * 500) + ["only-once"]
    ds = ray.data.from_arrow(pa.table({"s": pa.array(vals)}))
    assert exact_cardinality(ds, "s") == 4  # nulls excluded
