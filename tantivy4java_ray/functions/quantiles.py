"""Exact distributed quantiles and exact distinct counts.

Two operators that turn the engine's *approximate* analytics surfaces
(HDR-sketch percentiles, HLL cardinality — ``aggs.py``) into exact,
SQL-oracled answers with 100 TB-shaped plans:

- ``exact_quantiles``: iterative bucket refinement ("distributed
  selection"). NO shuffle and NO sort — each round is one streaming
  ``map_batches`` pass over the (column-pruned) input that bincounts the
  active intervals; the driver narrows each target order statistic to
  the bucket containing its rank and repeats. With 4096 buckets a round
  resolves 12 bits of the value's position, so 3-4 passes reach a tail
  small enough to collect and select exactly. Compare: a global
  ``ds.sort`` is an all-to-all exchange of the whole column; this moves
  only ``O(buckets * targets)`` ints per pass to the driver.
- ``exact_cardinality``: dual 64-bit keys (16 B/row, map-side deduped)
  -> ``groupby(h1)`` shuffle -> per-group distinct-``h2`` counts ->
  distributed ``sum``. The only all-to-all moves 16-byte keys, never
  values; per-group output stays in the cluster (the driver sees one
  scalar). Numeric columns use two BIJECTIVE bit mixers (zero
  collision probability — genuinely exact); strings use two
  independently-keyed siphashes (``dedup.exact_dedup``'s 2^-128
  contract).

The reference has neither operator (its percentiles/cardinality are
sketch-based intermediate aggs merged across splits,
``native/src/searcher/aggregation/deserialize.rs:7-10``); these are the
exact companions a curation pipeline needs when the answer feeds a
cut-off decision rather than a dashboard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: second independent siphash key (16 bytes), distinct from dedup's
_CARD_KEY2 = "t4jr-card-key-02"


# ---------------------------------------------------------------------------
# exact quantiles — iterative bucket refinement (no shuffle, no sort)
# ---------------------------------------------------------------------------

def _minmax_count(ds, col: str) -> tuple[int, float, float, int, int]:
    """One streaming pass: (n_finite, min, max, n_neginf, n_posinf).
    NaN/null are excluded; +/-inf are counted separately so quantiles
    can place them at the ends of the sorted order (they are real,
    orderable doubles in SQL)."""
    def part(t: pa.Table) -> pa.Table:
        x = np.asarray(t.column(col).to_numpy(zero_copy_only=False),
                       np.float64)
        ninf = int((x == -np.inf).sum())
        pinf = int((x == np.inf).sum())
        x = x[np.isfinite(x)]
        return pa.table({"n": pa.array([len(x)], pa.int64()),
                         "lo": pa.array([float(x.min()) if len(x)
                                         else np.inf]),
                         "hi": pa.array([float(x.max()) if len(x)
                                         else -np.inf]),
                         "ninf": pa.array([ninf], pa.int64()),
                         "pinf": pa.array([pinf], pa.int64())})

    rows = ds.map_batches(part, batch_format="pyarrow").take_all()
    n = int(sum(r["n"] for r in rows))
    lo = min((r["lo"] for r in rows), default=np.inf)
    hi = max((r["hi"] for r in rows), default=-np.inf)
    return (n, float(lo), float(hi),
            int(sum(r["ninf"] for r in rows)),
            int(sum(r["pinf"] for r in rows)))


def _bucket_edges(lo: float, hi: float, closed: bool,
                  nbuckets: int) -> np.ndarray:
    """Driver-computed bucket edges for interval [lo, hi) (or [lo, hi]
    when ``closed``). Duplicate linspace edges (ulp-narrow intervals at
    large magnitudes) are collapsed so every bucket has positive width —
    guaranteeing each refinement round strictly shrinks the interval —
    and a closed interval gets a synthetic zero-width point bucket
    [hi, hi] at the end so boundary values resolve in one more round
    instead of re-selecting the parent forever."""
    edges = np.unique(np.linspace(lo, hi, nbuckets + 1))
    if closed:
        edges = np.append(edges, hi)
    return edges


def _assign_buckets(x: np.ndarray, edges: np.ndarray,
                    closed: bool) -> np.ndarray | None:
    """Bucket index for each value of ``x`` that falls in the interval,
    or None if none do. Buckets are [e_j, e_{j+1}) right-open; with
    ``closed``, values == hi clip into the final point bucket."""
    lo, hi = edges[0], edges[-1]
    m = x[(x >= lo) & ((x <= hi) if closed else (x < hi))]
    if not len(m):
        return None
    return np.clip(np.searchsorted(edges, m, side="right") - 1,
                   0, len(edges) - 2)


class _IntervalBincount:
    """Per-batch bincount of values into each active interval's buckets.

    Emits one row per non-empty (interval, bucket) — a few thousand ints
    per batch regardless of batch size. Edges are computed ONCE on the
    driver (`_bucket_edges`) and broadcast via the closure, so the
    worker's bucket boundaries can never drift from the driver's
    child-interval bookkeeping."""

    def __init__(self, col: str, edges: list[np.ndarray],
                 closed: list[bool]):
        self.col = col
        self.edges = edges
        self.closed = closed

    def __call__(self, t: pa.Table) -> pa.Table:
        x = np.asarray(t.column(self.col).to_numpy(zero_copy_only=False),
                       np.float64)
        x = x[np.isfinite(x)]
        iv, bk, ct = [], [], []
        for i, e in enumerate(self.edges):
            j = _assign_buckets(x, e, self.closed[i])
            if j is None:
                continue
            c = np.bincount(j, minlength=len(e) - 1)
            nz = np.flatnonzero(c)
            iv.append(np.full(len(nz), i, np.int32))
            bk.append(nz.astype(np.int32))
            ct.append(c[nz].astype(np.int64))
        if not iv:
            return pa.table({"iv": pa.array([], pa.int32()),
                             "bk": pa.array([], pa.int32()),
                             "ct": pa.array([], pa.int64())})
        return pa.table({"iv": pa.array(np.concatenate(iv)),
                         "bk": pa.array(np.concatenate(bk)),
                         "ct": pa.array(np.concatenate(ct))})


class _IntervalCollect:
    """Tail pass: pull the (small, <= tail_threshold per interval) raw
    values inside each final interval so the driver can select exactly."""

    def __init__(self, col: str,
                 intervals: list[tuple[float, float, bool]]):
        self.col = col
        self.intervals = intervals

    def __call__(self, t: pa.Table) -> pa.Table:
        x = np.asarray(t.column(self.col).to_numpy(zero_copy_only=False),
                       np.float64)
        x = x[np.isfinite(x)]
        iv, vals = [], []
        for i, (lo, hi, closed) in enumerate(self.intervals):
            m = x[(x >= lo) & ((x <= hi) if closed else (x < hi))]
            if len(m):
                iv.append(np.full(len(m), i, np.int32))
                vals.append(m)
        if not iv:
            return pa.table({"iv": pa.array([], pa.int32()),
                             "v": pa.array([], pa.float64())})
        return pa.table({"iv": pa.array(np.concatenate(iv)),
                         "v": pa.array(np.concatenate(vals))})


def exact_order_statistics(ds, col: str, ks: list[int], *,
                           nbuckets: int = 4096,
                           tail_threshold: int = 65536,
                           max_rounds: int = 40,
                           _stats: tuple[int, float, float] | None = None
                           ) -> dict[int, float]:
    """Exact k-th order statistics (0-indexed ranks over the sorted
    finite values of ``col``) via iterative bucket refinement.

    Scale: ``1 + rounds + 1`` streaming passes over one column, zero
    shuffle; driver state is O(nbuckets * len(ks)) per round. All ranks
    share every pass. See module docstring for the 100 TB argument.
    """
    stats3 = _stats if _stats is not None else _minmax_count(ds, col)[:3]
    n, lo, hi = stats3
    if n == 0:
        raise ValueError(f"exact_order_statistics: no finite values in "
                         f"{col!r}")
    bad = [k for k in ks if not 0 <= k < n]
    if bad:
        raise ValueError(f"ranks {bad} out of range for n={n}")
    out: dict[int, float] = {}
    # state: (lo, hi, closed_hi, rank_offset, count_inside, ks_inside);
    # intervals are [lo, hi) unless closed_hi (the global-max owner)
    Interval = tuple[float, float, bool, int, int, list[int]]
    active: list[Interval] = [(lo, hi, True, 0, n, sorted(set(ks)))]
    # intervals small enough to collect accumulate across rounds and are
    # pulled in ONE tail pass after refinement converges (collecting
    # inside the loop costs an extra full scan per round)
    pending: list[Interval] = []
    for _ in range(max_rounds):
        refine: list[Interval] = []
        for ivl in active:
            ilo, ihi, closed, _off, cnt, iks = ivl
            if (ihi == ilo) or (not closed
                                and np.nextafter(ilo, np.inf) >= ihi):
                # interval holds exactly one representable value: done
                for k in iks:
                    out[k] = ilo
            elif cnt <= tail_threshold:
                pending.append(ivl)
            else:
                refine.append(ivl)
        if not refine:
            break
        # one shared bincount pass over every interval still refining
        edges = [_bucket_edges(a, b, c, nbuckets)
                 for a, b, c, *_ in refine]
        closed_flags = [c for _a, _b, c, *_ in refine]
        binc = _IntervalBincount(col, edges, closed_flags)
        df = ds.map_batches(binc, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
        max_nb = max(len(e) - 1 for e in edges)
        counts = np.zeros((len(refine), max_nb), np.int64)
        np.add.at(counts, (df["iv"].to_numpy(), df["bk"].to_numpy()),
                  df["ct"].to_numpy())
        nxt: dict[tuple[float, float, bool, int, int], list[int]] = {}
        for i, (_ilo, _ihi, _closed, off, cnt, iks) in enumerate(refine):
            e = edges[i]
            c = counts[i][:len(e) - 1]
            if int(c.sum()) != cnt:  # pragma: no cover - internal check
                raise AssertionError(
                    f"interval count drift: {int(c.sum())} != {cnt}")
            cum = np.cumsum(c)
            for k in iks:
                j = int(np.searchsorted(cum, k - off, side="right"))
                noff = off + (int(cum[j - 1]) if j else 0)
                # a child is closed only if it is the zero-width point
                # bucket [hi, hi] of a closed parent
                key = (float(e[j]), float(e[j + 1]), e[j] == e[j + 1],
                       noff, int(c[j]))
                nxt.setdefault(key, []).append(k)
        active = [(a, b, c, o, ct, sorted(ks_))
                  for (a, b, c, o, ct), ks_ in nxt.items()]
        if not active:
            break
    else:  # pragma: no cover - max_rounds is generous
        raise RuntimeError("exact_order_statistics did not converge")
    if pending:
        coll = _IntervalCollect(
            col, [(a, b, c) for a, b, c, *_ in pending])
        df = ds.map_batches(coll, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
        iv_all = df["iv"].to_numpy()
        v_all = df["v"].to_numpy()
        for i, (_a, _b, _c, off, cnt, iks) in enumerate(pending):
            vals = np.sort(v_all[iv_all == i])
            if len(vals) != cnt:  # pragma: no cover - internal check
                raise AssertionError(
                    f"interval count drift: {len(vals)} != {cnt}")
            for k in iks:
                out[k] = float(vals[k - off])
    return out


def exact_quantiles(ds, col: str, percents: list[float], *,
                    nbuckets: int = 4096,
                    tail_threshold: int = 65536) -> dict[float, float]:
    """Exact continuous quantiles (numpy/DuckDB ``quantile_cont``
    convention: linear interpolation at ``h = (n-1) * p``), computed
    distributed with zero shuffle. ``percents`` are in [0, 100].

    +/-inf are real orderable doubles in SQL and participate: -inf
    values occupy the lowest ranks, +inf the highest (matching DuckDB's
    quantile_cont over a column containing infinities). NaN/null are
    excluded."""
    nf, lo, hi, nneg, npos = _minmax_count(ds, col)
    n = nf + nneg + npos
    if n == 0:
        raise ValueError(f"exact_quantiles: no values in {col!r}")
    ks: set[int] = set()
    plan: dict[float, tuple[int, int, float]] = {}
    for p in percents:
        if not 0.0 <= p <= 100.0:
            raise ValueError(f"percent {p} outside [0, 100]")
        h = (n - 1) * (p / 100.0)
        kf, kc = int(np.floor(h)), int(np.ceil(h))
        ks.update((kf, kc))
        plan[p] = (kf, kc, h - kf)
    # global rank k -> value: ranks below nneg are -inf, ranks past the
    # finite block are +inf, the middle shifts into finite-rank space
    finite_ks = sorted({k - nneg for k in ks if nneg <= k < nneg + nf})
    os_ = (exact_order_statistics(ds, col, finite_ks, nbuckets=nbuckets,
                                  tail_threshold=tail_threshold,
                                  _stats=(nf, lo, hi))
           if finite_ks else {})

    def val(k: int) -> float:
        if k < nneg:
            return -np.inf
        if k >= nneg + nf:
            return np.inf
        return os_[k - nneg]

    # lo*(1-f) + hi*f, NOT lo + (hi-lo)*f: matches DuckDB/std::lerp
    # bit-for-bit so the SQL oracle can compare at full precision.
    # frac == 0 short-circuits (inf * 0.0 is NaN, not 0)
    return {p: (val(kf) if frac == 0.0
                else val(kf) * (1.0 - frac) + val(kc) * frac)
            for p, (kf, kc, frac) in plan.items()}


# ---------------------------------------------------------------------------
# exact cardinality — 16-byte-key shuffle, scalar to the driver
# ---------------------------------------------------------------------------

def _mix64(x: np.ndarray) -> np.ndarray:
    """MurmurHash3 fmix64 (public finalizer): a BIJECTION on u64, so
    distinct inputs can never collide. Vectorized numpy."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x.view(np.int64)


def _distinct_keys(t: pa.Table, col: str) -> pa.Table:
    """Map side: per-batch-distinct ``(__h, __h2)`` key pairs.

    Strings use two independently-KEYED siphashes like
    ``dedup.exact_dedup_keys`` (NUL -> U+FFFD so pandas' C-string
    siphash sees the whole value): collision contract 2^-128 per pair.
    Numerics are stronger — both keys are BIJECTIVE 64-bit mixers of
    the raw value bits (pandas' keyless splitmix-style numeric path
    ignores ``hash_key``, so a second keyed call would return h1
    again; verified in tests), hence numeric counts are exact with NO
    collision probability at all. -0.0 is canonicalized to 0.0 (SQL
    equality). Nulls are excluded (COUNT(DISTINCT) semantics)."""
    import pyarrow.compute as pc
    c = t.column(col)
    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    arr = arr.filter(pc.is_valid(arr))
    if len(arr) == 0 or pa.types.is_null(arr.type):
        # all-null batch (a pure-null column types as arrow null)
        return pa.table({"__h": pa.array([], pa.int64()),
                         "__h2": pa.array([], pa.int64())})
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        # INJECTIVE escape so pandas' C-string siphash (which stops at
        # NUL) sees the whole value without colliding distinct inputs:
        # escape the escape char first (U+FFFD -> U+FFFD'1'), then
        # NUL -> U+FFFD'0'. A bare replace NUL->U+FFFD would alias
        # 'a\x00b' with a literal 'a�b'.
        arr = pc.replace_substring(arr, "\N{REPLACEMENT CHARACTER}",
                                   "\N{REPLACEMENT CHARACTER}1")
        arr = pc.replace_substring(arr, "\x00",
                                   "\N{REPLACEMENT CHARACTER}0")
        vals = np.asarray(arr.to_numpy(zero_copy_only=False), object)
        h1 = pd.util.hash_array(vals).view(np.int64)
        h2 = pd.util.hash_array(vals, hash_key=_CARD_KEY2).view(np.int64)
    else:
        vals = np.ascontiguousarray(
            arr.to_numpy(zero_copy_only=False))
        if vals.dtype.kind == "f":
            vals = vals.astype(np.float64) + 0.0   # -0.0 -> 0.0
            bits = vals.view(np.uint64)
        elif vals.dtype.kind in "iub":
            # 8-byte ints: reinterpret bits (uint64 must not go through
            # astype(int64), which is value-converting); smaller widths
            # widen losslessly first
            bits = (vals.view(np.uint64) if vals.dtype.itemsize == 8
                    else vals.astype(np.int64).view(np.uint64))
        else:
            raise TypeError(
                f"exact_cardinality: unsupported dtype {vals.dtype} "
                f"for column {col!r}")
        h1 = pd.util.hash_array(bits.view(np.int64)).view(np.int64)
        h2 = _mix64(bits)
    order = np.lexsort((h2, h1))
    h1s, h2s = h1[order], h2[order]
    first = np.ones(len(h1s), bool)
    first[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
    return pa.table({"__h": pa.array(h1s[first], pa.int64()),
                     "__h2": pa.array(h2s[first], pa.int64())})


def exact_cardinality(ds, col: str) -> int:
    """Exact COUNT(DISTINCT col), nulls excluded.

    Plan: map-side distinct 16 B key pairs -> ``groupby(__h)`` (the only
    shuffle; values never move) -> per-group ``nunique(__h2)`` -> a
    distributed ``sum`` whose single scalar is all the driver receives.
    """
    def block_count(t: pa.Table) -> pa.Table:
        # the sorted block's distinct (h1, h2) runs, vectorized — NO
        # per-group Python (a groupby.map_groups here would invoke a
        # Python UDF once per distinct value: O(count-distinct) calls)
        h1 = np.asarray(t.column("__h").to_numpy(), np.int64)
        h2 = np.asarray(t.column("__h2").to_numpy(), np.int64)
        if not len(h1):   # don't rely on sort never emitting empty blocks
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("n", "f1", "f2", "l1", "l2")})
        first = np.ones(len(h1), bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        return pa.table({
            "n": pa.array([int(first.sum())], pa.int64()),
            "f1": pa.array([int(h1[0])], pa.int64()),
            "f2": pa.array([int(h2[0])], pa.int64()),
            "l1": pa.array([int(h1[-1])], pa.int64()),
            "l2": pa.array([int(h2[-1])], pa.int64())})

    rows = (ds.map_batches(lambda t: _distinct_keys(t, col),
                           batch_format="pyarrow")
              .sort(["__h", "__h2"])
              .map_batches(block_count, batch_format="pyarrow",
                           batch_size=None).take_all())
    if not rows:
        return 0   # all-null column: SQL COUNT(DISTINCT) says 0
    total = sum(r["n"] for r in rows)
    # a key spanning a block boundary was counted once per block it
    # touches; boundary keys can only be a block's first or last run,
    # so the correction needs just 2 keys per block (order-independent)
    from collections import Counter
    seen: Counter = Counter()
    for r in rows:
        for k in {(r["f1"], r["f2"]), (r["l1"], r["l2"])}:
            seen[k] += 1
    total -= sum(c - 1 for c in seen.values() if c > 1)
    return int(total)
