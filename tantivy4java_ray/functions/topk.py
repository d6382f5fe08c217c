"""Shuffle-free distributed top-k over a Dataset column.

``ds.sort(col).limit(k)`` is an all-to-all range exchange over the whole
table; for top-k the right shape is a per-block partial top-k (each block
emits <= k rows) followed by a tiny driver merge — the same pattern the
engine's BM25 top-k and ANN stages use. At 100 TB only
``k x num_blocks`` rows ever leave the workers.

Ties are broken by ``tie_cols`` ascending (deterministic, matching
``ORDER BY key DESC, tie LIMIT k`` SQL semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _desc_key(vals: np.ndarray) -> np.ndarray:
    """Order-REVERSING transform usable as a lexsort key. Plain ``-vals``
    wraps unsigned dtypes (0 stays the minimum) and overflows at
    ``int64.min``; this handles unsigned/signed ints, bools, datetimes,
    floats, and falls back to unique-rank for object dtypes."""
    k = vals.dtype.kind
    if k in "ub":
        return ~vals
    if k == "i":
        return ~(vals.astype(np.uint64) ^ np.uint64(1 << 63))
    if k in "Mm":
        return _desc_key(vals.view(np.int64))
    if k == "f":
        return -vals
    _, inv = np.unique(vals, return_inverse=True)
    return inv.max() - inv


def _block_topk(t: pa.Table, key: str, k: int, descending: bool,
                tie_cols: tuple[str, ...]) -> pa.Table:
    vals = np.asarray(t.column(key).to_numpy(zero_copy_only=False))
    if vals.dtype.kind == "O":
        # null string keys: np.unique/lexsort cannot compare None with
        # str — exclude them (numeric-NaN keys already sort last/drop)
        null = pd.isna(vals)
        if null.any():
            t = t.filter(pa.array(~null))
            vals = vals[~null]
    if t.num_rows <= k:
        return t
    ties = []
    for c in tie_cols:
        tv = np.asarray(t.column(c).to_numpy(zero_copy_only=False))
        if tv.dtype.kind == "O":
            # factorize: None -> -1 (sorts first), comparable codes
            tv, _ = pd.factorize(tv, sort=True)
        ties.append(tv)
    sort_keys = tuple(reversed(ties)) + (
        (_desc_key(vals),) if descending else (vals,))
    order = np.lexsort(sort_keys)[:k]
    return t.take(pa.array(order))


def topk(ds, key: str, k: int, *, descending: bool = True,
         tie_cols: tuple[str, ...] = (), filter_expr=None
         ) -> pd.DataFrame:
    """Exact top-k rows of ``ds`` by ``key`` -> small pandas DataFrame.

    ``filter_expr``: optional ``fn(pa.Table) -> BooleanArray`` applied
    vectorized inside the same map_batches pass (no separate row-UDF
    filter stage)."""

    def part(t: pa.Table) -> pa.Table:
        if filter_expr is not None:
            t = t.filter(filter_expr(t))
        return _block_topk(t, key, k, descending, tie_cols)

    parts = ds.map_batches(part, batch_format="pyarrow").take_all()
    if not parts:
        return pd.DataFrame()
    df = pd.DataFrame(parts)
    df = df.sort_values([key, *tie_cols],
                        ascending=[not descending] + [True] * len(tie_cols),
                        kind="mergesort")
    return df.head(k).reset_index(drop=True)
