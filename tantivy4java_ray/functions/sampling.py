"""Deterministic sampling for training-data mixing.

``ds.random_sample`` is nondeterministic across retries/block layouts —
useless for resumable 100 TB pipelines where a re-run must pick the SAME
rows. These samplers decide per-row from a multiplicative hash of a key
column, so membership is a pure function of the row (stable under
repartitioning, retries, resume), map-only (zero shuffle), and
SQL-expressible for oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: Knuth's multiplicative constant (odd -> bijective mod 2^32): the low
#: 32 bits of key*A are a well-mixed deterministic "uniform" in [0, 2^32)
_A = 2654435761
_M = np.uint64(1) << np.uint64(32)


def _keep_mask(keys: np.ndarray, frac: float) -> np.ndarray:
    """keys*A mod 2^32 < frac*2^32 — wrapping uint64 product's low 32
    bits equal (key*A) mod 2^32 for any nonnegative key, which is what
    a HUGEINT SQL oracle computes."""
    u = (keys.astype(np.uint64) * np.uint64(_A)) % _M
    return u < np.uint64(min(max(frac, 0.0), 1.0) * float(_M))


def sample_deterministic(ds, key_col: str, frac: float):
    """Keep ~``frac`` of rows, chosen by the hash of ``key_col`` —
    same rows on every run, any partitioning. Map-only."""
    def f(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(key_col).to_numpy(zero_copy_only=False),
                       np.int64)
        return t.filter(pa.array(_keep_mask(k, frac)))
    return ds.map_batches(f, batch_format="pyarrow")


def sample_stratified(ds, key_col: str, group_col: str,
                      fractions: dict[str, float],
                      default_frac: float = 0.0):
    """Per-group keep fractions (training-data domain mixing: e.g.
    ``{"web": 0.3, "books": 1.0}``). Groups absent from ``fractions``
    keep ``default_frac``. Map-only; the fraction table is tiny and
    rides the closure; membership is a pure row function (resume-safe).
    """
    items = dict(fractions)

    def f(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(key_col).to_numpy(zero_copy_only=False),
                       np.int64)
        g = t.column(group_col).to_pandas()
        fr = g.map(items).fillna(default_frac).to_numpy(np.float64)
        u = (k.astype(np.uint64) * np.uint64(_A)) % _M
        keep = u < (np.clip(fr, 0.0, 1.0) * float(_M)).astype(np.uint64)
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")
