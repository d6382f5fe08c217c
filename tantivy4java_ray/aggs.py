"""Aggregations: Elasticsearch-style DSL with partial (per-partition /
per-block) states merged to a final result.

Mirrors the reference's aggregation surface (12 ``SplitAggregation``
classes, ``aggregation/*.java``) and its execution model — each split
computes an *intermediate* result and the caller merges
(``native/src/searcher/aggregation/deserialize.rs:7-10``). Here the partial
state is computed vectorized (pandas/numpy) per Arrow batch or per docdata
partition, and merging is associative, so it runs as ``map_batches`` +
driver merge with no shuffle.

Supported: terms (size + optional shard_size partial truncation),
multi_terms, histogram / date_histogram (offset incl. signed duration
strings, min_doc_count, hard_bounds, extended_bounds, keyed — the full
``HistogramAggregation.java:42-225`` parameter surface), range,
min/max/sum/avg/count/value_count/stats, cardinality (HyperLogLog),
percentiles (HDR-style log-bucket sketch, ~1% relative error), and
ARBITRARILY NESTED sub-aggregations under any bucket agg — partial
compute, merge, and finalize all recurse
(``GroupBySubAggregationTest.java``, ``TermsAggregation.java:93-105``
semantics). ``shard_size`` bounds each partial's terms dict (top
shard_size by doc_count, ES-style approximate mode); without it terms
are exact.
"""

from __future__ import annotations

import math
import pickle
import re
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

# ES search.max_buckets default: hard cap on buckets a single (sub-)agg may
# emit, enforced before gap fill so an outlier key errors instead of OOMing
MAX_BUCKETS = 65536

# ---------------------------------------------------------------------------
# HyperLogLog (cardinality) — per-partition registers merged by max
# ---------------------------------------------------------------------------

_HLL_P = 12
_HLL_M = 1 << _HLL_P


def _hll_update(registers: np.ndarray, values: np.ndarray) -> None:
    if len(values) == 0:
        return
    if values.dtype == object or values.dtype.kind in "USM":
        h = pd.util.hash_array(values.astype(object))
    else:
        h = pd.util.hash_array(np.ascontiguousarray(values))
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = (h << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)
    # rho = leading zeros of remaining bits + 1
    lz = np.zeros(len(rest), np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    alive = np.ones(len(rest), bool)
    for _ in range(64 - _HLL_P + 1):
        zero_top = alive & ((cur & mask) == 0)
        lz[zero_top] += 1
        alive &= zero_top
        if not alive.any():
            break
        cur = cur << np.uint64(1)
    rho = lz + 1
    np.maximum.at(registers, idx, rho)


def _hll_estimate(registers: np.ndarray) -> float:
    m = float(_HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------------------
# interval parsing for date_histogram
# ---------------------------------------------------------------------------

_UNIT_US = {"ms": 1_000, "s": 1_000_000, "m": 60_000_000,
            "h": 3_600_000_000, "d": 86_400_000_000}


def parse_fixed_interval(s: str | None) -> int:
    """'30s' / '1d' / '100ms' -> microseconds (intervals 1ms..7d,
    ``README.md:1076``)."""
    if s is None:
        # the reference's DateHistogramAggregation serializes
        # calendar_interval, but the tantivy aggregation layer it
        # delegates to supports fixed intervals only — match that
        # contract with a clear error instead of a TypeError
        raise ValueError(
            "date_histogram requires fixed_interval (calendar_interval "
            "is not supported, matching tantivy's aggregation layer)")
    m = re.fullmatch(r"(\d+)(ms|s|m|h|d)", s)
    if not m:
        raise ValueError(f"bad fixed_interval {s!r}")
    return int(m.group(1)) * _UNIT_US[m.group(2)]


def parse_offset_duration(s: str) -> int:
    """date_histogram ``offset``: signed duration string ('-4h', '+1d',
    '30m') -> microseconds (``DateHistogramAggregation.java:113-121``
    shifts bucket boundaries by this amount)."""
    m = re.fullmatch(r"([+-]?)(\d+)(ms|s|m|h|d)", s)
    if not m:
        raise ValueError(f"bad date_histogram offset {s!r}")
    v = int(m.group(2)) * _UNIT_US[m.group(3)]
    return -v if m.group(1) == "-" else v


def _hist_offset_us(body: dict) -> int:
    off = body.get("offset")
    return parse_offset_duration(off) if off else 0


def _validate_hist_bounds(body: dict) -> None:
    """Contract checks shared by histogram/date_histogram
    (``HistogramAggregation.java:116,129`` — extended_bounds cannot
    combine with min_doc_count > 0; tantivy additionally requires
    extended_bounds to lie inside hard_bounds when both are set)."""
    eb, hb = body.get("extended_bounds"), body.get("hard_bounds")
    if eb is not None and int(body.get("min_doc_count", 0)) > 0:
        raise ValueError(
            "extended_bounds cannot be combined with min_doc_count > 0")
    if eb is not None and hb is not None and (
            float(eb["min"]) < float(hb["min"])
            or float(eb["max"]) > float(hb["max"])):
        raise ValueError(
            f"extended_bounds have to be inside hard_bounds, "
            f"extended_bounds: {eb}, hard_bounds: {hb}")


def _col_numpy(table: pa.Table, name: str) -> np.ndarray:
    col = table.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# percentiles — HDR-style log-bucket sketch (mergeable, bounded memory;
# the ES percentiles agg's HDR mode, ~1% relative error at _PCT_K=128)
# ---------------------------------------------------------------------------

_PCT_K = 128  # sub-buckets per decade; rel. error ~ 10^(1/(2K))-1 ≈ 0.9%
_PCT_DEFAULTS = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)
#: dedicated bucket index for +/-inf magnitudes — far beyond any finite
#: float64 decade (log10(max)*K ≈ 39457), so it sorts after every real
#: bucket; naive floor(log10(inf)*K).astype(int64) would wrap to
#: INT64_MIN and sort as the SMALLEST bucket, shifting every quantile
_PCT_INF_IDX = 1 << 40


def _pct_rep(i: int) -> float:
    """Bucket midpoint magnitude for index ``i`` (inf-bucket aware)."""
    return math.inf if i >= _PCT_INF_IDX else 10.0 ** ((i + 0.5) / _PCT_K)


def _pct_partial(vals: np.ndarray) -> dict:
    v = pd.to_numeric(pd.Series(vals), errors="coerce").to_numpy(np.float64)
    v = v[~np.isnan(v)]
    state = {"zeros": int((v == 0).sum()),
             "min": float(v.min()) if len(v) else math.inf,
             "max": float(v.max()) if len(v) else -math.inf,
             "count": int(len(v)), "pos": {}, "neg": {}}
    for sign, key in ((1.0, "pos"), (-1.0, "neg")):
        part = v[v * sign > 0] * sign
        if not len(part):
            continue
        fin = np.where(np.isinf(part), 1.0, part)
        idx = np.where(np.isinf(part), _PCT_INF_IDX,
                       np.floor(np.log10(fin) * _PCT_K)).astype(np.int64)
        u, c = np.unique(idx, return_counts=True)
        state[key] = dict(zip(u.tolist(), c.tolist()))
    return state


def _pct_merge(a: dict, b: dict) -> dict:
    out = {"zeros": a["zeros"] + b["zeros"],
           "min": min(a["min"], b["min"]), "max": max(a["max"], b["max"]),
           "count": a["count"] + b["count"],
           "pos": dict(a["pos"]), "neg": dict(a["neg"])}
    for key in ("pos", "neg"):
        for i, c in b[key].items():
            out[key][i] = out[key].get(i, 0) + c
    return out


def _pct_finalize(state: dict | None, percents) -> dict:
    if not state or not state["count"]:
        return {"values": {f"{p:g}": None for p in percents}}
    # ascending value order: negatives (idx desc), zeros, positives
    reps: list[float] = []
    counts: list[int] = []
    for i in sorted(state["neg"], reverse=True):
        reps.append(-_pct_rep(i))
        counts.append(state["neg"][i])
    if state["zeros"]:
        reps.append(0.0)
        counts.append(state["zeros"])
    for i in sorted(state["pos"]):
        reps.append(_pct_rep(i))
        counts.append(state["pos"][i])
    cum = np.cumsum(counts)
    n = state["count"]
    out = {}
    for p in percents:
        rank = max(1, math.ceil(p / 100.0 * n))
        j = int(np.searchsorted(cum, rank))
        val = reps[min(j, len(reps) - 1)]
        out[f"{p:g}"] = float(min(max(val, state["min"]), state["max"]))
    return {"values": out}


def _pct_rank_finalize(state: dict | None, values) -> dict:
    """percentile_ranks: % of data <= each query value (same log-bucket
    sketch as percentiles; exact at the min/max edges).

    A bucket is counted when its LOWER bound <= v — i.e. v's own
    containing bucket counts in full (its members are within the
    sketch's relative error of v), matching HDR's at-or-below
    semantics. Comparing against bucket midpoints instead would drop
    the entire containing bucket for any v below its midpoint — a 0%
    answer for the modal value of a concentrated distribution."""
    if not state or not state["count"]:
        return {"values": {f"{v:g}": None for v in values}}
    lows: list[float] = []   # ascending bucket lower bounds
    counts: list[int] = []
    for i in sorted(state["neg"], reverse=True):
        # neg bucket i holds values in [-10^((i+1)/K), -10^(i/K))
        lows.append(-math.inf if i >= _PCT_INF_IDX
                    else -(10.0 ** ((i + 1) / _PCT_K)))
        counts.append(state["neg"][i])
    if state["zeros"]:
        lows.append(0.0)
        counts.append(state["zeros"])
    for i in sorted(state["pos"]):
        # pos bucket i holds values in [10^(i/K), 10^((i+1)/K))
        lows.append(math.inf if i >= _PCT_INF_IDX
                    else 10.0 ** (i / _PCT_K))
        counts.append(state["pos"][i])
    cum = np.cumsum(counts)
    n = state["count"]
    out = {}
    for v in values:
        v = float(v)
        if v < state["min"]:
            pct = 0.0
        elif v >= state["max"]:
            pct = 100.0
        else:
            j = int(np.searchsorted(lows, v, side="right"))
            pct = 100.0 * (float(cum[j - 1]) if j else 0.0) / n
        out[f"{v:g}"] = pct
    return {"values": out}


# ---------------------------------------------------------------------------
# partial state per agg kind
# ---------------------------------------------------------------------------

_METRICS = ("min", "max", "sum", "avg", "count", "value_count", "stats",
            "extended_stats")


def _spec_kind(spec: dict) -> tuple[str, dict, dict]:
    sub = spec.get("aggs") or spec.get("aggregations") or {}
    for k in ("terms", "multi_terms", "histogram", "date_histogram", "range",
              "cardinality", "percentiles", "percentile_ranks", *_METRICS):
        if k in spec:
            return k, spec[k], sub
    raise ValueError(f"unrecognized aggregation spec {spec!r}")


def partial_agg(specs: dict[str, dict], table: pa.Table,
                mask: np.ndarray | None = None) -> dict[str, Any]:
    """Compute partial states for all aggs over one Arrow batch."""
    if mask is not None and mask.dtype == bool:
        table = table.filter(pa.array(mask))
    return {name: _partial_one(spec, table) for name, spec in specs.items()}


def _partial_one(spec: dict, table: pa.Table) -> Any:
    kind, body, sub = _spec_kind(spec)

    if kind in _METRICS:
        vals = _col_numpy(table, body["field"])
        if kind in ("count", "value_count"):
            # count valid values of ANY type — numeric coercion would
            # zero out string fields
            n_valid = int(pd.notna(pd.Series(vals)).sum())
            return {"min": math.inf, "max": -math.inf, "sum": 0.0,
                    "sum_sq": 0.0, "count": n_valid}
        vals = pd.to_numeric(pd.Series(vals), errors="coerce").to_numpy(np.float64)
        ok = ~np.isnan(vals)
        v = vals[ok]
        return {"min": float(v.min()) if len(v) else math.inf,
                "max": float(v.max()) if len(v) else -math.inf,
                "sum": float(v.sum()),
                "sum_sq": float((v * v).sum()),
                "count": int(len(v))}

    if kind == "cardinality":
        vals = _col_numpy(table, body["field"])
        vals = vals[pd.notna(vals)]
        regs = np.zeros(_HLL_M, np.uint8)
        _hll_update(regs, vals)
        return regs

    if kind in ("percentiles", "percentile_ranks"):
        return _pct_partial(_col_numpy(table, body["field"]))

    # bucket aggs -> dict bucket_key -> {"doc_count": n, "sub": {...}}
    if kind == "terms":
        keys = pd.Series(_col_numpy(table, body["field"]))
        grp = keys.dropna()
        sel = keys.notna().to_numpy()
    elif kind == "multi_terms":
        cols = [pd.Series(_col_numpy(table, f)) for f in body["fields"]]
        keys = pd.Series(list(zip(*[c.to_numpy() for c in cols])))
        ok = np.logical_and.reduce([c.notna().to_numpy() for c in cols])
        grp = keys[ok]
        sel = ok
    elif kind == "histogram":
        _validate_hist_bounds(body)
        vals = pd.to_numeric(pd.Series(_col_numpy(table, body["field"])),
                             errors="coerce").to_numpy(np.float64)
        interval = float(body["interval"])
        offset = float(body.get("offset", 0.0))
        sel = ~np.isnan(vals)
        hb = body.get("hard_bounds")
        if hb is not None:
            # values outside [min, max] are discarded (inclusive bounds,
            # HistogramAggregation.java:143-147 / tantivy histogram.rs)
            sel &= (vals >= float(hb["min"])) & (vals <= float(hb["max"]))
        bucket = (np.floor((vals[sel] - offset) / interval) * interval
                  + offset)
        grp = pd.Series(bucket)
    elif kind == "date_histogram":
        _validate_hist_bounds(body)
        vals = _col_numpy(table, body["field"])
        ts = np.asarray(vals, "datetime64[us]").astype(np.int64)
        sel = pd.notna(pd.Series(vals)).to_numpy()
        iv = parse_fixed_interval(body.get("fixed_interval")
                                  or body.get("interval"))
        off = _hist_offset_us(body)
        hb = body.get("hard_bounds")
        if hb is not None:
            # epoch-MILLISECOND bounds on the wire
            # (DateHistogramAggregation.java:160-168), timestamps in µs
            sel &= (ts >= int(hb["min"]) * 1000) & (ts <= int(hb["max"]) * 1000)
        bucket = ((ts[sel] - off) // iv) * iv + off
        grp = pd.Series(bucket)
    elif kind == "range":
        vals = pd.to_numeric(pd.Series(_col_numpy(table, body["field"])),
                             errors="coerce").to_numpy(np.float64)
        sel = ~np.isnan(vals)
        v = vals[sel]
        bucket = np.full(len(v), -1, np.int64)
        for i, r in enumerate(body["ranges"]):
            lo = float(r.get("from", -math.inf))
            hi = float(r.get("to", math.inf))
            bucket[(v >= lo) & (v < hi) & (bucket == -1)] = i
        keep = bucket >= 0
        grp = pd.Series(bucket[keep])
        s2 = np.flatnonzero(sel)[keep]
        sel = np.zeros(table.num_rows, bool)
        sel[s2] = True
    else:
        raise ValueError(kind)

    sub_specs = sub
    out: dict[Any, dict] = {}
    if len(grp) == 0:
        return out
    if sub_specs:
        # segmented partials: factorize the bucket key ONCE, compute
        # metric children with bincount/segmented kernels across ALL
        # buckets — no per-bucket Arrow take (a high-cardinality terms
        # agg would otherwise do thousands of small takes per batch)
        sub_tbl = table.filter(pa.array(np.asarray(sel, bool)))
        codes, uniq = pd.factorize(grp.to_numpy(), sort=False)
        nb = len(uniq)
        doc_counts = np.bincount(codes, minlength=nb)
        sub_states: dict[str, list] = {}
        order = None
        for n, s in sub_specs.items():
            skind, sbody, ssub = _spec_kind(s)
            if skind in _METRICS and not ssub:
                vals = _col_numpy(sub_tbl, sbody["field"])
                if skind in ("count", "value_count"):
                    okm = pd.notna(pd.Series(vals)).to_numpy()
                    cnt = np.bincount(codes[okm], minlength=nb)
                    sub_states[n] = [
                        {"min": math.inf, "max": -math.inf, "sum": 0.0,
                         "sum_sq": 0.0, "count": int(cnt[i])}
                        for i in range(nb)]
                else:
                    v = pd.to_numeric(pd.Series(vals), errors="coerce"
                                      ).to_numpy(np.float64)
                    okm = ~np.isnan(v)
                    c, vv = codes[okm], v[okm]
                    cnt = np.bincount(c, minlength=nb)
                    sm = np.bincount(c, weights=vv, minlength=nb)
                    s2 = np.bincount(c, weights=vv * vv, minlength=nb)
                    mn = np.full(nb, math.inf)
                    mx = np.full(nb, -math.inf)
                    np.minimum.at(mn, c, vv)
                    np.maximum.at(mx, c, vv)
                    sub_states[n] = [
                        {"min": float(mn[i]), "max": float(mx[i]),
                         "sum": float(sm[i]), "sum_sq": float(s2[i]),
                         "count": int(cnt[i])} for i in range(nb)]
            else:
                # generic child (nested buckets / sketches): sort codes
                # once, one contiguous take per bucket
                if order is None:
                    order = np.argsort(codes, kind="stable")
                    bnd = np.searchsorted(codes[order], np.arange(nb + 1))
                sub_states[n] = [
                    _partial_one(s, sub_tbl.take(
                        pa.array(order[bnd[i]:bnd[i + 1]])))
                    for i in range(nb)]
        out = {uniq[i]: {"doc_count": int(doc_counts[i]),
                         "sub": {n: sub_states[n][i] for n in sub_specs}}
               for i in range(nb)}
    else:
        vc = grp.value_counts()
        for key, cnt in vc.items():
            out[key] = {"doc_count": int(cnt), "sub": {}}
    if kind in ("terms", "multi_terms"):
        shard_size = body.get("shard_size")
        if shard_size is not None and len(out) > int(shard_size):
            # ES-style partial truncation: bounds per-shard state on
            # high-cardinality fields (TermsAggregation.java:87) at the
            # cost of exactness for near-tied tails
            keep = sorted(out.items(),
                          key=lambda kv: (-kv[1]["doc_count"],
                                          _sort_key(kv[0])))[:int(shard_size)]
            out = dict(keep)
    return out


def merge_states(specs: dict[str, dict], a: dict, b: dict) -> dict:
    return {name: _merge_one(spec, a.get(name), b.get(name))
            for name, spec in specs.items()}


def _merge_one(spec: dict, x: Any, y: Any) -> Any:
    if x is None:
        return y
    if y is None:
        return x
    kind, _body, sub = _spec_kind(spec)
    if kind in _METRICS:
        return {"min": min(x["min"], y["min"]), "max": max(x["max"], y["max"]),
                "sum": x["sum"] + y["sum"], "sum_sq": x["sum_sq"] + y["sum_sq"],
                "count": x["count"] + y["count"]}
    if kind == "cardinality":
        return np.maximum(x, y)
    if kind in ("percentiles", "percentile_ranks"):
        return _pct_merge(x, y)
    out = dict(x)
    for key, st in y.items():
        if key in out:
            merged_sub = {n: _merge_one(s, out[key]["sub"].get(n),
                                        st["sub"].get(n))
                          for n, s in sub.items()} if sub else {}
            out[key] = {"doc_count": out[key]["doc_count"] + st["doc_count"],
                        "sub": merged_sub}
        else:
            out[key] = st
    return out


def finalize(specs: dict[str, dict], state: dict) -> dict:
    return {name: _finalize_one(spec, state.get(name))
            for name, spec in specs.items()}


def _finalize_one(spec: dict, st: Any) -> dict:
    kind, body, sub = _spec_kind(spec)
    if kind in _METRICS:
        st = st or {"min": math.inf, "max": -math.inf, "sum": 0.0,
                    "sum_sq": 0.0, "count": 0}
        n = st["count"]
        if kind == "min":
            return {"value": st["min"] if n else None}
        if kind == "max":
            return {"value": st["max"] if n else None}
        if kind == "sum":
            return {"value": st["sum"]}
        if kind == "avg":
            return {"value": st["sum"] / n if n else None}
        if kind in ("count", "value_count"):
            return {"value": n}
        var = (st["sum_sq"] / n - (st["sum"] / n) ** 2) if n else None
        out = {"count": n, "min": st["min"] if n else None,
               "max": st["max"] if n else None, "sum": st["sum"],
               "avg": st["sum"] / n if n else None,
               "std_deviation": math.sqrt(max(var, 0.0)) if n else None}
        if kind == "extended_stats":
            sd = out["std_deviation"]
            avg = out["avg"]
            out.update({
                "sum_of_squares": st["sum_sq"],
                "variance": max(var, 0.0) if n else None,
                "std_deviation_bounds": {
                    "upper": avg + 2 * sd if n else None,
                    "lower": avg - 2 * sd if n else None}})
        return out
    if kind == "cardinality":
        return {"value": round(_hll_estimate(st)) if st is not None else 0}
    if kind == "percentiles":
        return _pct_finalize(st, body.get("percents", _PCT_DEFAULTS))
    if kind == "percentile_ranks":
        return _pct_rank_finalize(st, body.get("values", ()))

    st = st or {}
    if kind == "range":
        # ES/tantivy contract: EVERY requested range appears, empty
        # ranges with doc_count 0 (buckets are not sparse)
        for i in range(len(body.get("ranges", ()))):
            st.setdefault(i, {"doc_count": 0, "sub": {}})
    elif kind in ("histogram", "date_histogram") \
            and int(body.get("min_doc_count", 0)) == 0:
        # ES/tantivy fill INTERIOR gaps between the first and last
        # occupied bucket when min_doc_count == 0, extended to cover
        # ``extended_bounds`` when present (which also emits buckets
        # from an EMPTY match set). Keys regenerate from integer bucket
        # ordinals (j*iv + offset — the same expression the partial
        # used), never by float accumulation, so filled keys are
        # bit-identical to computed ones
        _validate_hist_bounds(body)
        eb = body.get("extended_bounds")
        keys = sorted(st)
        if kind == "histogram":
            iv = float(body["interval"])
            off = float(body.get("offset", 0.0))
            jays = [round((keys[0] - off) / iv),
                    round((keys[-1] - off) / iv)] if keys else []
            if eb is not None:
                # bounds are VALUES; they extend to the buckets
                # containing them (HistogramAggregation.java:126-138)
                jays += [math.floor((float(eb["min"]) - off) / iv),
                         math.floor((float(eb["max"]) - off) / iv)]
            if jays:
                lo_j, hi_j = min(jays), max(jays)
                # ES caps total buckets (search.max_buckets = 65536)
                # instead of materializing arbitrarily wide gap fills; a
                # single outlier key must not OOM the driver
                if hi_j - lo_j + 1 > MAX_BUCKETS:
                    raise ValueError(
                        f"too many buckets: histogram span "
                        f"{hi_j - lo_j + 1} exceeds the {MAX_BUCKETS} "
                        "bucket cap (interval too fine for the data "
                        "range, or outlier keys present)")
                for j in range(lo_j, hi_j + 1):
                    st.setdefault(j * iv + off, {"doc_count": 0, "sub": {}})
        else:
            iv = parse_fixed_interval(body.get("fixed_interval")
                                      or body.get("interval"))
            off = _hist_offset_us(body)
            ends = [int(keys[0]), int(keys[-1])] if keys else []
            if eb is not None:
                # epoch-ms bounds snapped onto the offset grid
                ends += [(int(eb["min"]) * 1000 - off) // iv * iv + off,
                         (int(eb["max"]) * 1000 - off) // iv * iv + off]
            if ends:
                lo_k, hi_k = min(ends), max(ends)
                span = (hi_k - lo_k) // iv + 1
                if span > MAX_BUCKETS:
                    raise ValueError(
                        f"too many buckets: date_histogram span {span} "
                        f"exceeds the {MAX_BUCKETS} bucket cap "
                        "(fixed_interval too fine for the time range, or "
                        "sentinel timestamps present)")
                for k in range(lo_k, hi_k + 1, iv):
                    st.setdefault(k, {"doc_count": 0, "sub": {}})
    if kind in ("histogram", "date_histogram"):
        mdc = int(body.get("min_doc_count", 0))
        if mdc > 0:
            st = {k: v for k, v in st.items() if v["doc_count"] >= mdc}
    items = list(st.items())
    if kind in ("terms", "multi_terms"):
        size = int(body.get("size", 10))
        # count desc, key asc — deterministic (tie-break pinned by tests)
        items.sort(key=lambda kv: (-kv[1]["doc_count"], _sort_key(kv[0])))
        items = items[:size]
    else:
        # histogram / date_histogram / range keys are numeric bucket ids
        items.sort(key=lambda kv: kv[0])
    buckets = []
    for key, v in items:
        b: dict[str, Any] = {"key": _py_key(key, kind, body),
                             "doc_count": v["doc_count"]}
        for n, s in sub.items():
            b[n] = _finalize_one(s, v["sub"].get(n))
        buckets.append(b)
    if body.get("keyed") and kind in ("histogram", "date_histogram"):
        # keyed map output (HistogramAggregation.java:154-162); each
        # entry keeps its "key" field, ES keyed-response shape
        return {"buckets": {str(b["key"]): b for b in buckets}}
    return {"buckets": buckets}


def _sort_key(k: Any):
    return (str(k),) if not isinstance(k, tuple) else tuple(str(x) for x in k)


def _py_key(key: Any, kind: str, body: dict) -> Any:
    if kind == "date_histogram":
        return str(np.datetime64(int(key), "us"))
    if kind == "range":
        r = body["ranges"][int(key)]
        return f"{r.get('from', '*')}-{r.get('to', '*')}"
    if isinstance(key, tuple):
        return list(key)
    if isinstance(key, (np.generic,)):
        return key.item()
    return key


# ---------------------------------------------------------------------------
# execution surfaces
# ---------------------------------------------------------------------------

def aggregate_dataset(ds, specs: dict[str, dict], *,
                      tree_threshold: int = 1024, fanin: int = 32) -> dict:
    """Run the DSL over any Ray Dataset: vectorized partials per block
    (map_batches), associative merge — no shuffle.

    Up to ``tree_threshold`` block states merge serially on the driver;
    above it (10^5 blocks × a wide terms dict would be a driver hot
    spot) states tree-reduce in ``map_batches`` rounds of ``fanin``
    until few enough remain."""
    def to_state(batch: pa.Table) -> pa.Table:
        st = partial_agg(specs, batch)
        return pa.table({"state": pa.array([pickle.dumps(st)],
                                           pa.large_binary())})

    def merge_block(t: pa.Table) -> pa.Table:
        m: dict = {}
        for blob in t.column("state").to_pylist():
            m = merge_states(specs, m, pickle.loads(blob))
        return pa.table({"state": pa.array([pickle.dumps(m)],
                                           pa.large_binary())})

    sd = ds.map_batches(to_state, batch_format="pyarrow").materialize()
    n = sd.count()
    while n > tree_threshold:
        sd = (sd.repartition(math.ceil(n / fanin))
              .map_batches(merge_block, batch_format="pyarrow",
                           batch_size=None).materialize())
        n = sd.count()
    merged: dict = {}
    for row in sd.take_all():
        merged = merge_states(specs, merged, pickle.loads(row["state"]))
    return finalize(specs, merged)


def _partition_partial(index_dir: str, part: dict, specs: dict,
                       match: np.ndarray | None,
                       deleted: np.ndarray | None = None) -> dict:
    from tantivy4java_ray import storage as st

    path = st.sjoin(index_dir, "docdata",
                    f"part-{part['pid']:05d}.parquet")
    tbl = st.read_parquet_any(path)
    mask = None
    if match is not None:
        lo = np.searchsorted(match, part["doc_base"])
        hi = np.searchsorted(match, part["doc_base"] + part["num_docs"])
        local = (match[lo:hi] - part["doc_base"]).astype(np.int64)
        mask = np.zeros(tbl.num_rows, bool)
        mask[local] = True
    if deleted is not None and len(deleted):
        # merge-time delete tombstones: a match-all aggregation must
        # exclude them just like every query path does (_drop_deleted)
        lo = np.searchsorted(deleted, part["doc_base"])
        hi = np.searchsorted(deleted, part["doc_base"] + part["num_docs"])
        if hi > lo:
            if mask is None:
                mask = np.ones(tbl.num_rows, bool)
            mask[(deleted[lo:hi] - part["doc_base"]).astype(np.int64)] = False
    return partial_agg(specs, tbl, mask)


def merged_partial_on_index(reader, query, specs: dict[str, dict],
                            distributed: bool | None = None) -> dict:
    """The intermediate (mergeable) aggregation state for ``reader``'s
    docs matching ``query`` — the per-split ``IntermediateAggregationResults``
    analog. A doc-range-pinned leaf reader produces the partial for its
    range; partials from disjoint leaves merge associatively at the root
    before one ``finalize``."""
    match: np.ndarray | None = None
    if query is not None and query.kind != "all":
        match = reader.evaluate(query)[0]  # sorted global doc ids
    # evaluate() already drops delete tombstones; a match-all pass must
    # drop them here instead
    deleted = reader.deleted if match is None else None

    parts = reader.partitions
    if distributed is None:
        distributed = len(parts) > 4
    if distributed:
        import ray

        match_ref = ray.put(match)
        specs_ref = ray.put(specs)
        deleted_ref = ray.put(deleted)

        @ray.remote(num_cpus=1)
        def _task(index_dir: str, part: dict):
            return pickle.dumps(_partition_partial(
                index_dir, part, ray.get(specs_ref), ray.get(match_ref),
                ray.get(deleted_ref)))

        futs = [_task.remote(reader.index_dir, p) for p in parts]
        merged: dict = {}
        for blob in ray.get(futs):
            merged = merge_states(specs, merged, pickle.loads(blob))
    else:
        merged = {}
        for p in parts:
            merged = merge_states(
                specs, merged,
                _partition_partial(reader.index_dir, p, specs, match,
                                   deleted))
    return merged


def run_aggregations_on_index(reader, query, specs: dict[str, dict],
                              distributed: bool | None = None) -> dict:
    """Aggregate over index fast fields for docs matching ``query`` —
    per-partition partials merged like the reference's per-split
    intermediate results. With several partitions the partial pass fans
    out as Ray tasks (matched ids broadcast once via ``ray.put``); tiny
    indexes stay inline to skip task overhead."""
    return finalize(specs,
                    merged_partial_on_index(reader, query, specs,
                                            distributed))
