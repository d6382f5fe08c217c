"""Aggregation fixtures (FIXTURES.md F4): 100 rows, 5 skewed categories,
prices i*1.5, daily dates from 2023-01-01."""

import numpy as np
import pyarrow as pa
import pytest

from tantivy4java_ray.aggs import (
    aggregate_dataset, finalize, merge_states, partial_agg,
    parse_fixed_interval,
)

COUNTS = {"cat0": 50, "cat1": 25, "cat2": 15, "cat3": 7, "cat4": 3}


@pytest.fixture(scope="module")
def table():
    cats = sum(([c] * n for c, n in COUNTS.items()), [])
    n = len(cats)
    return pa.table({
        "category": pa.array(cats),
        "price": pa.array([i * 1.5 for i in range(n)], pa.float64()),
        "rating": pa.array([float(i % 5) for i in range(n)], pa.float64()),
        "published": pa.array(
            np.arange(n).astype("datetime64[D]").astype("datetime64[us]")
            + np.datetime64("2023-01-01", "us").astype(np.int64)),
    })


def run(specs, table, split=None):
    if split is None:
        return finalize(specs, partial_agg(specs, table))
    a = partial_agg(specs, table.slice(0, split))
    b = partial_agg(specs, table.slice(split))
    return finalize(specs, merge_states(specs, a, b))


@pytest.mark.parametrize("split", [None, 33])
def test_terms(table, split):
    out = run({"cats": {"terms": {"field": "category", "size": 3}}}, table,
              split)
    assert out["cats"]["buckets"] == [
        {"key": "cat0", "doc_count": 50},
        {"key": "cat1", "doc_count": 25},
        {"key": "cat2", "doc_count": 15}]


@pytest.mark.parametrize("split", [None, 50])
def test_stats_and_metrics(table, split):
    specs = {"s": {"stats": {"field": "price"}},
             "mn": {"min": {"field": "price"}},
             "mx": {"max": {"field": "price"}},
             "av": {"avg": {"field": "price"}},
             "sm": {"sum": {"field": "price"}},
             "ct": {"value_count": {"field": "price"}}}
    out = run(specs, table, split)
    n = 100
    prices = [i * 1.5 for i in range(n)]
    assert out["mn"]["value"] == 0.0
    assert out["mx"]["value"] == 148.5
    assert out["av"]["value"] == pytest.approx(sum(prices) / n)
    assert out["sm"]["value"] == pytest.approx(sum(prices))
    assert out["ct"]["value"] == n
    assert out["s"]["count"] == n
    assert out["s"]["std_deviation"] == pytest.approx(np.std(prices))


@pytest.mark.parametrize("split", [None, 10])
def test_histogram(table, split):
    out = run({"h": {"histogram": {"field": "price", "interval": 50.0}}},
              table, split)
    assert [(b["key"], b["doc_count"]) for b in out["h"]["buckets"]] == [
        (0.0, 34), (50.0, 33), (100.0, 33)]


def test_date_histogram(table):
    out = run({"d": {"date_histogram": {"field": "published",
                                        "fixed_interval": "1d"}}}, table)
    assert len(out["d"]["buckets"]) == 100
    assert out["d"]["buckets"][0]["key"].startswith("2023-01-01")
    assert all(b["doc_count"] == 1 for b in out["d"]["buckets"])


def test_range(table):
    out = run({"r": {"range": {"field": "price", "ranges": [
        {"to": 25.0}, {"from": 25.0, "to": 75.0}, {"from": 75.0}]}}},
        table)
    bs = out["r"]["buckets"]
    assert [b["doc_count"] for b in bs] == [17, 33, 50]


def test_cardinality_accuracy(table):
    out = run({"c": {"cardinality": {"field": "category"}}}, table, split=33)
    assert out["c"]["value"] == 5
    big = pa.table({"v": pa.array([f"u{i}" for i in range(20000)])})
    out = run({"c": {"cardinality": {"field": "v"}}}, big, split=9999)
    assert abs(out["c"]["value"] - 20000) / 20000 < 0.05


def test_sub_aggregation(table):
    out = run({"cats": {"terms": {"field": "category", "size": 2},
                        "aggs": {"avg_price": {"avg": {"field": "price"}}}}},
              table, split=40)
    b0 = out["cats"]["buckets"][0]
    assert b0["key"] == "cat0"
    assert b0["avg_price"]["value"] == pytest.approx(
        np.mean([i * 1.5 for i in range(50)]))


def test_multi_terms(table):
    out = run({"mt": {"multi_terms": {"fields": ["category", "rating"],
                                      "size": 100}}}, table)
    total = sum(b["doc_count"] for b in out["mt"]["buckets"])
    assert total == 100
    assert out["mt"]["buckets"][0]["doc_count"] == 10  # cat0 x 5 ratings


def test_parse_interval():
    assert parse_fixed_interval("1d") == 86_400_000_000
    assert parse_fixed_interval("100ms") == 100_000
    with pytest.raises(ValueError):
        parse_fixed_interval("2w")


def test_aggregate_dataset(ray_session, table):
    import ray.data
    ds = ray.data.from_arrow(table).repartition(4)
    out = aggregate_dataset(ds, {
        "cats": {"terms": {"field": "category", "size": 3}},
        "s": {"stats": {"field": "price"}}})
    assert out["cats"]["buckets"][0] == {"key": "cat0", "doc_count": 50}
    assert out["s"]["count"] == 100


def test_index_aggs_distributed_equals_inline(ray_session):
    """The Ray-task fan-out path must equal the inline partial merge."""
    from tantivy4java_ray.pipelines.search import IndexReader
    from tantivy4java_ray.aggs import run_aggregations_on_index
    from tantivy4java_ray.query import Query
    idx = "/tmp/t4jr_test_index"
    import os
    if not os.path.exists(f"{idx}/manifest.json"):
        pytest.skip("webpages index not built in this session order")
    r = IndexReader(idx)
    specs = {"langs": {"terms": {"field": "lang", "size": 10}},
             "n": {"value_count": {"field": "warc_ts"}}}
    q = Query.term("text", "w0000")
    a = run_aggregations_on_index(r, q, specs, distributed=False)
    b = run_aggregations_on_index(r, q, specs, distributed=True)
    assert a == b


def test_nested_two_level_subaggs():
    import pyarrow as pa
    from tantivy4java_ray.aggs import partial_agg, merge_states, finalize
    t1 = pa.table({"a": ["x", "x", "y", "y"], "b": [1.0, 2.0, 1.0, 3.0],
                   "v": [10.0, 20.0, 30.0, 40.0]})
    t2 = pa.table({"a": ["x", "z"], "b": [1.0, 9.0], "v": [5.0, 7.0]})
    specs = {"t": {"terms": {"field": "a", "size": 10},
                   "aggs": {"h": {"histogram": {"field": "b",
                                                "interval": 1.0},
                                  "aggs": {"s": {"sum": {"field": "v"}}}}}}}
    m = merge_states(specs, partial_agg(specs, t1), partial_agg(specs, t2))
    out = finalize(specs, m)
    x = out["t"]["buckets"][0]
    assert x["key"] == "x" and x["doc_count"] == 3
    b1 = x["h"]["buckets"][0]
    assert b1["key"] == 1.0 and b1["doc_count"] == 2 and b1["s"]["value"] == 15.0


def test_terms_shard_size_truncation():
    import numpy as np
    import pyarrow as pa
    from tantivy4java_ray.aggs import partial_agg, merge_states, finalize
    rng = np.random.default_rng(0)
    # zipf-ish: key k appears (50 - k) times
    keys = [f"k{k:02d}" for k in range(40) for _ in range(50 - k)]
    t = pa.table({"a": keys})
    specs_exact = {"t": {"terms": {"field": "a", "size": 5}}}
    specs_trunc = {"t": {"terms": {"field": "a", "size": 5,
                                   "shard_size": 8}}}
    pe = partial_agg(specs_exact, t)
    pt = partial_agg(specs_trunc, t)
    assert len(pe["t"]) == 40
    assert len(pt["t"]) == 8          # partial state bounded
    top_exact = [b["key"] for b in finalize(
        specs_exact, merge_states(specs_exact, {}, pe))["t"]["buckets"]]
    top_trunc = [b["key"] for b in finalize(
        specs_trunc, merge_states(specs_trunc, {}, pt))["t"]["buckets"]]
    # heads agree on a single shard (approximation shows only across
    # shards with divergent tails)
    assert top_exact == top_trunc


def test_value_count_on_string_field():
    import pyarrow as pa
    from tantivy4java_ray.aggs import partial_agg, merge_states, finalize
    t = pa.table({"s": ["a", "b", None, "c"]})
    specs = {"n": {"value_count": {"field": "s"}},
             "c": {"count": {"field": "s"}}}
    out = finalize(specs, merge_states(specs, {}, partial_agg(specs, t)))
    assert out["n"]["value"] == 3
    assert out["c"]["value"] == 3


@pytest.mark.parametrize("split", [None, 33])
def test_percentiles_accuracy(table, split):
    """HDR log-bucket sketch: every reported percentile within ~2%
    relative error of the exact numpy percentile; merge == single-shot."""
    out = run({"p": {"percentiles": {"field": "price"}}}, table, split)
    prices = np.array([i * 1.5 for i in range(100)])
    for pct, got in out["p"]["values"].items():
        # the sketch reports nearest-rank (inverted CDF) percentiles
        want = float(np.percentile(prices, float(pct),
                                   method="inverted_cdf"))
        if want == 0.0:
            assert abs(got) < 1e-9
        else:
            assert abs(got - want) / max(abs(want), 1.0) < 0.05, (pct, got,
                                                                  want)
    # negative + zero + positive values, custom percents
    mix = pa.table({"v": pa.array([-100.0, -1.0, 0.0, 0.0, 1.0, 10.0,
                                   100.0, 1000.0], pa.float64())})
    out = run({"p": {"percentiles": {"field": "v",
                                     "percents": [50.0, 100.0]}}}, mix,
              split=3 if split else None)
    assert out["p"]["values"]["100"] == 1000.0
    assert abs(out["p"]["values"]["50"]) < 0.05
    # empty input
    empty = pa.table({"v": pa.array([], pa.float64())})
    out = run({"p": {"percentiles": {"field": "v"}}}, empty)
    assert out["p"]["values"]["50"] is None


def test_percentiles_as_sub_agg(table):
    out = run({"cats": {"terms": {"field": "category", "size": 1},
                        "aggs": {"p": {"percentiles": {
                            "field": "price", "percents": [50.0]}}}}},
              table, split=40)
    b0 = out["cats"]["buckets"][0]
    assert b0["key"] == "cat0"
    # cat0 = first 50 rows -> median price ~ 36.75
    got = b0["p"]["values"]["50"]
    assert abs(got - 36.75) / 36.75 < 0.05


def test_segmented_subagg_matches_bruteforce():
    # high-cardinality terms + every metric child computed by the
    # segmented bincount path must equal a numpy brute-force per bucket
    # (incl. null values and an all-null bucket)
    rng = np.random.default_rng(7)
    n = 5000
    keys = rng.integers(0, 800, n)
    vals = rng.standard_normal(n)
    vals[rng.random(n) < 0.1] = np.nan
    vals[keys == 13] = np.nan  # one bucket with no valid values
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    out = finalize({"g": {"terms": {"field": "k", "size": 800},
                          "aggs": {"s": {"stats": {"field": "v"}},
                                   "a": {"avg": {"field": "v"}},
                                   "c": {"value_count": {"field": "v"}}}}},
                   partial_agg({"g": {"terms": {"field": "k", "size": 800},
                                      "aggs": {"s": {"stats": {"field": "v"}},
                                               "a": {"avg": {"field": "v"}},
                                               "c": {"value_count":
                                                     {"field": "v"}}}}}, t))
    by_key = {b["key"]: b for b in out["g"]["buckets"]}
    for k in (0, 13, 799):
        m = keys == k
        v = vals[m]
        vv = v[~np.isnan(v)]
        b = by_key[k]
        assert b["doc_count"] == int(m.sum())
        assert b["c"]["value"] == len(vv)
        if len(vv):
            assert abs(b["s"]["sum"] - vv.sum()) < 1e-9
            assert b["s"]["min"] == vv.min() and b["s"]["max"] == vv.max()
            assert abs(b["a"]["value"] - vv.mean()) < 1e-12
        else:
            assert b["a"]["value"] is None


def test_aggregate_dataset_tree_reduce(ray_session):
    # forcing a tiny threshold exercises >=2 tree rounds; result must
    # equal the serial driver merge
    import ray.data

    from tantivy4java_ray.aggs import aggregate_dataset
    rng = np.random.default_rng(11)
    import pandas as pd
    df = pd.DataFrame({"cat": rng.integers(0, 20, 4000),
                       "v": rng.standard_normal(4000)})
    ds = ray.data.from_pandas(df).repartition(40)
    specs = {"g": {"terms": {"field": "cat", "size": 30},
                   "aggs": {"s": {"sum": {"field": "v"}}}},
             "m": {"avg": {"field": "v"}}}
    direct = aggregate_dataset(ds, specs)
    tree = aggregate_dataset(ds, specs, tree_threshold=4, fanin=4)
    assert abs(tree["m"]["value"] - df["v"].mean()) < 1e-9
    # summation order differs between tree and serial merges -> compare
    # structure + counts exactly, float sums to 1e-9
    db = {b["key"]: b for b in direct["g"]["buckets"]}
    tb = {b["key"]: b for b in tree["g"]["buckets"]}
    assert set(db) == set(tb)
    for k, b in db.items():
        assert tb[k]["doc_count"] == b["doc_count"]
        assert abs(tb[k]["s"]["value"] - b["s"]["value"]) < 1e-9


def test_extended_stats(table):
    out = run({"e": {"extended_stats": {"field": "price"}}}, table, split=37)
    prices = np.array([i * 1.5 for i in range(100)])
    assert out["e"]["count"] == 100
    assert abs(out["e"]["variance"] - prices.var()) < 1e-9
    assert abs(out["e"]["sum_of_squares"] - (prices ** 2).sum()) < 1e-6
    b = out["e"]["std_deviation_bounds"]
    assert abs(b["upper"] - (prices.mean() + 2 * prices.std())) < 1e-9
    assert abs(b["lower"] - (prices.mean() - 2 * prices.std())) < 1e-9


@pytest.mark.parametrize("split", [None, 41])
def test_percentile_ranks(table, split):
    out = run({"r": {"percentile_ranks": {"field": "price",
                                          "values": [0.0, 74.25, 1000.0,
                                                     -5.0]}}},
              table, split)
    vals = out["r"]["values"]
    assert vals["-5"] == 0.0
    assert vals["1000"] == 100.0
    # 74.25 = price of row 49 -> ~50% of rows <= it (sketch ~1%)
    assert abs(vals["74.25"] - 50.0) < 3.0
    # empty input
    empty = pa.table({"v": pa.array([], pa.float64())})
    out = run({"r": {"percentile_ranks": {"field": "v",
                                          "values": [1.0]}}}, empty)
    assert out["r"]["values"]["1"] is None


def test_percentile_ranks_concentrated():
    """The query value's own containing bucket must count: for a modal
    value the rank is ~99%, not 0% (regression: midpoint compare
    dropped the whole containing bucket when v sat below its rep)."""
    t = pa.table({"v": pa.array([5.0] * 100 + [9.0], pa.float64())})
    out = run({"r": {"percentile_ranks": {"field": "v",
                                          "values": [5.0, 4.9]}}}, t)
    assert abs(out["r"]["values"]["5"] - 100 * 100 / 101) < 2.0
    # 4.9 lies below 5.0's bucket lower bound -> nothing at or below it
    assert out["r"]["values"]["4.9"] < 2.0


# ---------------------------------------------------------------------------
# histogram parameter surface: hard_bounds / extended_bounds / keyed /
# date offset (HistogramAggregation.java:42-225,
# DateHistogramAggregationTest.java:381-439)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("split", [None, 33])
def test_histogram_hard_bounds(table, split):
    # prices are i*1.5: [30, 89.9] keeps i=20..59, inclusive bounds
    out = run({"h": {"histogram": {
        "field": "price", "interval": 30.0,
        "hard_bounds": {"min": 30.0, "max": 89.9}}}}, table, split)
    assert [(b["key"], b["doc_count"]) for b in out["h"]["buckets"]] == [
        (30.0, 20), (60.0, 20)]


@pytest.mark.parametrize("split", [None, 50])
def test_histogram_extended_bounds(table, split):
    out = run({"h": {"histogram": {
        "field": "price", "interval": 30.0,
        "extended_bounds": {"min": -60.0, "max": 210.0}}}}, table, split)
    got = [(b["key"], b["doc_count"]) for b in out["h"]["buckets"]]
    # data occupies 0..120; bounds extend with empty buckets on both ends
    assert got == [(-60.0, 0), (-30.0, 0), (0.0, 20), (30.0, 20),
                   (60.0, 20), (90.0, 20), (120.0, 20), (150.0, 0),
                   (180.0, 0), (210.0, 0)]


def test_histogram_extended_bounds_empty_match(table):
    # extended_bounds emits its bucket grid even with NO data at all
    out = run({"h": {"histogram": {
        "field": "price", "interval": 50.0,
        "extended_bounds": {"min": 0.0, "max": 149.0}}}}, table.slice(0, 0))
    assert [(b["key"], b["doc_count"]) for b in out["h"]["buckets"]] == [
        (0.0, 0), (50.0, 0), (100.0, 0)]


def test_histogram_bounds_validation(table):
    with pytest.raises(ValueError, match="min_doc_count"):
        run({"h": {"histogram": {
            "field": "price", "interval": 50.0, "min_doc_count": 1,
            "extended_bounds": {"min": 0.0, "max": 10.0}}}}, table)
    with pytest.raises(ValueError, match="inside hard_bounds"):
        run({"h": {"histogram": {
            "field": "price", "interval": 50.0,
            "hard_bounds": {"min": 0.0, "max": 10.0},
            "extended_bounds": {"min": 0.0, "max": 20.0}}}}, table)


def test_histogram_keyed(table):
    out = run({"h": {"histogram": {"field": "price", "interval": 50.0,
                                   "keyed": True}}}, table)
    bk = out["h"]["buckets"]
    assert isinstance(bk, dict)
    assert set(bk) == {"0.0", "50.0", "100.0"}
    assert bk["50.0"] == {"key": 50.0, "doc_count": 33}


def test_date_histogram_offset(table):
    # daily docs at 00:00; a -12h offset puts each in the PREVIOUS
    # day's 12:00 bucket
    out = run({"d": {"date_histogram": {
        "field": "published", "fixed_interval": "1d",
        "offset": "-12h"}}}, table)
    bs = out["d"]["buckets"]
    assert len(bs) == 100
    assert bs[0]["key"].startswith("2022-12-31T12:00:00")
    assert all(b["doc_count"] == 1 for b in bs)


def test_date_histogram_hard_and_extended_bounds(table):
    import numpy as np
    day_ms = 86_400_000
    base_ms = int(np.datetime64("2023-01-01", "ms").astype(np.int64))
    # hard_bounds keep only the first 3 days (epoch-MILLISECOND wire
    # form, DateHistogramAggregation.java:160-168)
    out = run({"d": {"date_histogram": {
        "field": "published", "fixed_interval": "1d",
        "hard_bounds": {"min": base_ms, "max": base_ms + 2 * day_ms}}}},
        table, split=33)
    assert [b["doc_count"] for b in out["d"]["buckets"]] == [1, 1, 1]
    # extended_bounds emit 2 empty leading days before the data
    out = run({"d": {"date_histogram": {
        "field": "published", "fixed_interval": "1d",
        "extended_bounds": {"min": base_ms - 2 * day_ms,
                            "max": base_ms}}}}, table)
    bs = out["d"]["buckets"]
    assert len(bs) == 102
    assert bs[0]["key"].startswith("2022-12-30")
    assert bs[0]["doc_count"] == 0 and bs[1]["doc_count"] == 0
    assert bs[2]["doc_count"] == 1


def test_date_histogram_keyed_with_subagg(table):
    out = run({"d": {"date_histogram": {
        "field": "published", "fixed_interval": "1d", "keyed": True},
        "aggs": {"p": {"avg": {"field": "price"}}}}}, table)
    bk = out["d"]["buckets"]
    assert isinstance(bk, dict) and len(bk) == 100
    k0 = min(bk)
    assert k0.startswith("2023-01-01")
    assert bk[k0]["doc_count"] == 1 and bk[k0]["p"]["value"] == 0.0


def test_parse_offset_duration():
    from tantivy4java_ray.aggs import parse_offset_duration
    assert parse_offset_duration("-4h") == -4 * 3_600_000_000
    assert parse_offset_duration("+1d") == 86_400_000_000
    assert parse_offset_duration("30m") == 30 * 60_000_000
    with pytest.raises(ValueError):
        parse_offset_duration("4 hours")


def test_calendar_interval_clear_error(table):
    # the tantivy aggregation layer the reference delegates to supports
    # fixed intervals only; a calendar_interval must error clearly
    with pytest.raises(ValueError, match="fixed_interval"):
        run({"d": {"date_histogram": {"field": "published",
                                      "calendar_interval": "month"}}},
            table)
