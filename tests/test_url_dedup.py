"""URL keep-latest dedup (re-crawl dedup over the Common-Crawl page
shape) — canonicalization table, hand oracle, and a DuckDB differential
with the identical RE2 canonicalization chain."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from tantivy4java_ray.functions.dedup import (canonicalize_urls,
                                              url_dedup_latest)


def test_canonicalize_table():
    cases = {
        "HTTPS://WWW.Example.com:443/a/b/": "example.com/a/b",
        "http://example.com/a/b": "example.com/a/b",
        "https://example.com/a/b#frag": "example.com/a/b",
        "http://example.com:80/a/b": "example.com/a/b",
        "https://example.com:8443/x": "example.com:8443/x",  # non-default
        "https://www.example.com/a?q=1#x": "example.com/a?q=1",  # query kept
        "http://example.com:80": "example.com",
        # RFC 3986: host is case-insensitive, the PATH and QUERY are not
        "http://Example.com/Wiki/Apple": "example.com/Wiki/Apple",
        "http://example.com/Q?X=Y": "example.com/Q?X=Y",
        # fragment strip is (?s): a '#' swallows even embedded newlines
        "http://example.com/a#x\ny": "example.com/a",
        # port strip is scheme-blind (documented conflation):
        # http on the https default port still canonicalizes bare
        "http://example.com:443/a": "example.com/a",
    }
    got = canonicalize_urls(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_case_distinct_paths_not_conflated(ray_session):
    # '/wiki/Apple' and '/wiki/apple' are different pages: both survive
    df = pd.DataFrame({
        "page_id": np.asarray([1, 2], np.int64),
        "url": ["http://a.com/wiki/Apple", "http://A.com/wiki/apple"],
        "warc_ts": pd.to_datetime(["2024-01-01", "2024-06-01"])
        .astype("datetime64[us]"),
    })
    assert _run(df) == [1, 2]


def _run(df):
    import ray.data
    out = url_dedup_latest(ray.data.from_pandas(df), "url", "warc_ts",
                           "page_id").to_pandas()
    return sorted(out["page_id"].tolist()) if "page_id" in out.columns else []


def test_hand_oracle(ray_session):
    df = pd.DataFrame({
        "page_id": np.arange(5, dtype=np.int64),
        "url": ["http://a.com/x", "https://WWW.A.com/x/",  # same canon
                "http://b.com/y", "http://b.com/y",        # tie ts
                "http://c.com/z"],
        "warc_ts": pd.to_datetime(["2024-01-01", "2024-06-01",
                                   "2024-03-01", "2024-03-01",
                                   "2024-01-01"]).astype("datetime64[us]"),
    })
    # a.com/x: id 1 is newer; b.com/y: tie -> lower id 2; c: singleton
    assert _run(df) == [1, 2, 4]


def test_null_ts_loses_to_dated(ray_session):
    df = pd.DataFrame({
        "page_id": np.asarray([7, 8], np.int64),
        "url": ["http://a.com", "http://a.com"],
        "warc_ts": pd.Series([pd.NaT, pd.Timestamp("2020-01-01")],
                             dtype="datetime64[us]"),
    })
    assert _run(df) == [8]


def test_duckdb_differential(ray_session):
    rng = np.random.default_rng(11)
    hosts = [f"site{i}.example" for i in range(40)]
    rows = []
    for pid in range(600):
        h = hosts[rng.integers(0, 40)]
        if rng.random() < 0.3:
            h = h.upper()           # host case never distinguishes
        path = f"/{'P' if rng.random() < 0.3 else 'p'}/" \
               f"{rng.integers(0, 30)}"   # path case DOES distinguish
        scheme = rng.choice(["http://", "HTTPS://", "http://www.", ""])
        trail = rng.choice(["", "/", "#frag"])
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(
            seconds=int(rng.integers(0, 10_000)))
        rows.append((pid, f"{scheme}{h}{path}{trail}", ts))
    df = pd.DataFrame(rows, columns=["page_id", "url", "warc_ts"])
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")

    import ray.data
    got = sorted(url_dedup_latest(
        ray.data.from_pandas(df).repartition(7), "url", "warc_ts",
        "page_id").to_pandas()["page_id"].tolist())

    con = duckdb.connect()
    con.register("pages", df)
    # identical chain to canonicalize_urls: scheme (case-insensitive),
    # fragment, then host-only lowercase/www/port, rejoin, trailing /
    strip = ("regexp_replace(regexp_replace({c}, '^(?i)https?://', ''), "
             "'(?s)#.*$', '')")
    host = ("regexp_replace(regexp_replace(lower(regexp_extract("
            f"{strip}, '^[^/?]*')), '^www\\.', ''), ':(80|443)$', '')")
    rest = f"regexp_replace({strip}, '^[^/?]*', '')"
    canon = f"regexp_replace(concat({host}, {rest}), '/$', '')"
    want = con.sql(f"""
        SELECT p.page_id FROM pages p
        WHERE NOT EXISTS (
            SELECT 1 FROM pages q
            WHERE {canon.format(c='q.url')} IS NOT DISTINCT FROM
                  {canon.format(c='p.url')}
              AND (q.warc_ts > p.warc_ts
                   OR (q.warc_ts = p.warc_ts AND q.page_id < p.page_id)))
        ORDER BY p.page_id
    """).df()["page_id"].tolist()
    assert got == want
