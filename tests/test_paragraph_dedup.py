"""Paragraph-level exact dedup (CCNet-style keep-first) vs hand oracle
and a DuckDB differential on a random multi-paragraph corpus."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tantivy4java_ray.functions.dedup import paragraph_dedup


def _run(ds, **kw):
    out = paragraph_dedup(ds, "text", "doc_id", **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_paragraph_dedup_keep_first(ray_session):
    import ray.data
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha\nbeta\ngamma",
                 "beta\ndelta\nalpha",       # beta+alpha seen in doc 1
                 "delta\nepsilon"],          # delta seen in doc 2
    })
    out = _run(ray.data.from_pandas(docs))
    assert out["text"].tolist() == [
        "alpha\nbeta\ngamma", "delta", "epsilon"]


def test_within_doc_duplicates_and_empties(ray_session):
    import ray.data
    docs = pd.DataFrame({
        "doc_id": [7],
        # 'x' repeats within the doc; empty segments (double \n and a
        # trailing \n) must keep their slots
        "text": ["x\n\nx\ny\n"],
    })
    out = _run(ray.data.from_pandas(docs))
    # segments [x, '', x, y, '']: the duplicate 'x' at index 2 is
    # removed WITH its separator slot (string_agg semantics); empties
    # keep theirs
    assert out["text"].tolist() == ["x\n\ny\n"]


def test_multichar_separator_and_null_text(ray_session):
    import ray.data
    import pyarrow as pa
    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": pa.array(["a||b||a", "b||c", None])})
    out = _run(ray.data.from_arrow(docs), sep="||")
    assert out["text"].tolist() == ["a||b", "c", ""]


def test_no_duplicates_is_identity(ray_session):
    import ray.data
    docs = pd.DataFrame({"doc_id": [1, 2],
                         "text": ["p q r\ns t", "u v\nw"]})
    out = _run(ray.data.from_pandas(docs))
    assert out["text"].tolist() == docs["text"].tolist()


@pytest.mark.parametrize("seed", [3, 17])
def test_duckdb_differential_random_corpus(ray_session, seed):
    import ray.data
    rng = np.random.default_rng(seed)
    paras = [f"para {i} " + " ".join(
        f"w{rng.integers(0, 40)}" for _ in range(4)) for i in range(25)]
    texts = []
    for _ in range(60):
        k = int(rng.integers(1, 6))
        texts.append("\n".join(
            paras[int(rng.integers(0, len(paras)))] for _ in range(k)))
    docs = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                         "text": texts})
    mine = _run(ray.data.from_pandas(docs))
    ref = duckdb.sql("""
        WITH ex AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS para,
                 unnest(range(len(string_split(text, chr(10))))) AS i
          FROM docs
        ), firsts AS (
          SELECT para, min(doc_id * 100000 + i) AS fk
          FROM ex WHERE len(para) > 0 GROUP BY para
        ), kept AS (
          SELECT e.doc_id, e.para, e.i
          FROM ex e LEFT JOIN firsts f ON e.para = f.para
          WHERE len(e.para) = 0 OR e.doc_id * 100000 + e.i = f.fk
        )
        SELECT d.doc_id,
               coalesce((SELECT string_agg(k.para, chr(10) ORDER BY k.i)
                         FROM kept k WHERE k.doc_id = d.doc_id), '')
                   AS text
        FROM docs d ORDER BY d.doc_id
    """).fetchdf()
    assert mine["doc_id"].tolist() == ref["doc_id"].tolist()
    assert mine["text"].tolist() == ref["text"].tolist()


def test_groupby_fallback_path_matches_broadcast(ray_session):
    # broadcast_cap=0 forces the groupby(id) reassembly; results must be
    # identical to the broadcast fast path
    import ray.data
    rng = np.random.default_rng(9)
    paras = [f"p{i}" for i in range(10)]
    texts = ["\n".join(paras[int(rng.integers(0, 10))]
                       for _ in range(int(rng.integers(1, 5))))
             for _ in range(30)]
    docs = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                         "text": texts})
    fast = _run(ray.data.from_pandas(docs))
    slow = _run(ray.data.from_pandas(docs), broadcast_cap=0)
    assert fast["doc_id"].tolist() == slow["doc_id"].tolist()
    assert fast["text"].tolist() == slow["text"].tolist()


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style)
# ---------------------------------------------------------------------------

def test_repetition_stats_hand_cases(ray_session):
    import ray.data
    from tantivy4java_ray.functions.textstats import repetition_stats
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a a a a",           # one word repeated
                 "a b c d",           # all distinct
                 "x",                 # single word: no 2-grams
                 ""],                 # empty
    })
    out = (repetition_stats(ray.data.from_pandas(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_words"].tolist() == [4, 4, 1, 0]
    assert out["dup_word_frac"].tolist() == [0.75, 0.0, 0.0, 0.0]
    assert out["top_word_frac"].tolist() == [1.0, 0.25, 1.0, 0.0]
    # doc1 2-grams: (a a) x3 -> distinct 1/3, top 3/3
    assert out["dup_2gram_frac"].tolist() == [0.666667, 0.0, 0.0, 0.0]
    assert out["top_2gram_frac"].tolist() == [1.0, 0.333333, 0.0, 0.0]


def test_repetition_stats_duckdb_differential(ray_session):
    import ray.data
    from tantivy4java_ray.functions.textstats import repetition_stats
    rng = np.random.default_rng(41)
    texts = [" ".join(f"w{rng.integers(0, 12)}"
                      for _ in range(int(rng.integers(0, 30))))
             for _ in range(80)]
    docs = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64),
                         "text": texts})
    mine = (repetition_stats(ray.data.from_pandas(docs)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    ref = duckdb.sql(r"""
        WITH w AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                     x -> x <> '') AS ws FROM docs
        ), wc AS (
          SELECT doc_id, tok, count(*) AS c
          FROM (SELECT doc_id, unnest(ws) AS tok FROM w) GROUP BY 1, 2
        ), agg AS (
          SELECT doc_id, count(*) AS dw, max(c) AS tw, sum(c) AS nw
          FROM wc GROUP BY 1
        ), g AS (
          SELECT doc_id, [ws[i] || ' ' || ws[i+1]
                          for i in range(1, len(ws))] AS gs FROM w
        ), gc AS (
          SELECT doc_id, gr, count(*) AS c
          FROM (SELECT doc_id, unnest(gs) AS gr FROM g) GROUP BY 1, 2
        ), gagg AS (
          SELECT doc_id, count(*) AS dg, max(c) AS tg, sum(c) AS ng
          FROM gc GROUP BY 1
        )
        SELECT d.doc_id,
          coalesce(a.nw, 0)::BIGINT AS n_words,
          round(CASE WHEN coalesce(a.nw, 0) > 0
                THEN 1 - a.dw::DOUBLE / a.nw ELSE 0 END, 6)
              AS dup_word_frac,
          round(CASE WHEN coalesce(a.nw, 0) > 0
                THEN a.tw::DOUBLE / a.nw ELSE 0 END, 6) AS top_word_frac,
          round(CASE WHEN coalesce(ga.ng, 0) > 0
                THEN 1 - ga.dg::DOUBLE / ga.ng ELSE 0 END, 6)
              AS dup_2gram_frac,
          round(CASE WHEN coalesce(ga.ng, 0) > 0
                THEN ga.tg::DOUBLE / ga.ng ELSE 0 END, 6)
              AS top_2gram_frac
        FROM docs d LEFT JOIN agg a USING (doc_id)
        LEFT JOIN gagg ga USING (doc_id) ORDER BY d.doc_id
    """).fetchdf()
    for c in mine.columns:
        assert mine[c].tolist() == ref[c].tolist(), c


def test_keepfirst_losers_multiblock_boundaries(ray_session):
    # force MANY blocks through the sort so (h1,h2) runs span block
    # boundaries: the edge-fragment path must still pick the single
    # global first occurrence per group (a boundary bug silently
    # under-dedups)
    import ray.data
    from tantivy4java_ray.functions.dedup import _keepfirst_losers
    rng = np.random.default_rng(77)
    n = 4000
    # few distinct hash groups -> long runs guaranteed to span blocks
    h = rng.integers(0, 12, n).astype(np.int64)
    df = pd.DataFrame({
        "doc_id": rng.permutation(n).astype(np.int64),
        "__pidx": rng.integers(0, 5, n).astype(np.int64),
        "__h": h,
        "__h2": h * 7 + (h % 3),      # aligned, deterministic
    })
    # naive model: winner per (h,h2) = lexicographic min (doc_id, pidx);
    # doc_id is a permutation, so every row is a distinct (id,pidx) and
    # a set comparison is exact
    srt = df.sort_values(["__h", "__h2", "doc_id", "__pidx"],
                         kind="stable")
    first_mask = ~srt.duplicated(subset=["__h", "__h2"], keep="first")
    want = set(zip(srt[~first_mask.to_numpy()]["doc_id"],
                   srt[~first_mask.to_numpy()]["__pidx"]))
    blocks = [ray.data.from_pandas(df.iloc[i:i + 250])
              for i in range(0, n, 250)]
    ds = blocks[0].union(*blocks[1:])   # 16 input blocks
    out = _keepfirst_losers(ds, "doc_id").to_pandas()
    got = set(zip(out["doc_id"], out["__pidx"]))
    assert got == want


# ---------------------------------------------------------------------------
# test-set decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_hand_cases(ray_session):
    import ray.data
    from tantivy4java_ray.functions.dedup import decontaminate
    bench = ["the quick brown fox jumps", "short one"]
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "prefix the quick brown fox jumps suffix",  # contains bench 5gram
            "the quick brown wolf jumps high today",    # no shared 5-gram
            "short one",                                # exact short match
            "contains short one inside a longer doc",   # bench short item is
                                                        # WHOLE-doc shingle:
                                                        # must NOT flag
            "",                                         # empty: never flagged
        ]})
    clean, flagged = decontaminate(
        ray.data.from_pandas(docs), "text", "doc_id", bench, ngram=5)
    assert flagged.tolist() == [0, 2]
    assert sorted(clean.to_pandas()["doc_id"]) == [1, 3, 4]


def test_decontaminate_duckdb_differential(ray_session):
    import ray.data
    from tantivy4java_ray.functions.dedup import decontaminate
    rng = np.random.default_rng(13)
    texts = [" ".join(f"w{rng.integers(0, 25)}"
                      for _ in range(int(rng.integers(0, 18))))
             for _ in range(120)]
    docs = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                         "text": texts})
    bench = [texts[i] for i in range(0, 120, 17)]
    clean, _flagged = decontaminate(
        ray.data.from_pandas(docs), "text", "doc_id", bench, ngram=5)
    mine = sorted(clean.to_pandas()["doc_id"])
    ref = duckdb.sql(r"""
        WITH tk AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                     x -> x <> '') AS tk FROM docs
        ), sh AS (
          SELECT doc_id, CASE
              WHEN len(tk) = 0 THEN []
              WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
              ELSE [array_to_string(tk[i:i+4], ' ')
                    for i in range(1, len(tk) - 3)] END AS shingles
          FROM tk
        ), bench AS (
          SELECT DISTINCT unnest(shingles) AS g FROM sh
          WHERE doc_id % 17 = 0
        ), flagged AS (
          SELECT DISTINCT s.doc_id
          FROM sh s, unnest(s.shingles) AS u(g)
          JOIN bench b ON u.g = b.g
        )
        SELECT doc_id FROM docs
        WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
        ORDER BY doc_id
    """).fetchdf()["doc_id"].tolist()
    assert mine == ref


def test_keepfirst_winners_multiblock_boundaries(ray_session):
    # winners mode of the shared scan: exactly ONE winner per (h,h2)
    # group, the global min, with runs spanning block boundaries
    import ray.data
    from tantivy4java_ray.functions.dedup import _keepfirst_scan
    rng = np.random.default_rng(31)
    n = 3000
    h = rng.integers(0, 9, n).astype(np.int64)
    df = pd.DataFrame({
        "doc_id": rng.permutation(n).astype(np.int64),
        "__pidx": np.zeros(n, np.int64),
        "__h": h,
        "__h2": h * 11 + 1,
    })
    srt = df.sort_values(["__h", "__h2", "doc_id", "__pidx"],
                         kind="stable")
    first = ~srt.duplicated(subset=["__h", "__h2"], keep="first")
    want = set(zip(srt[first.to_numpy()]["doc_id"],
                   srt[first.to_numpy()]["__pidx"]))
    blocks = [ray.data.from_pandas(df.iloc[i:i + 200])
              for i in range(0, n, 200)]
    out = _keepfirst_scan(blocks[0].union(*blocks[1:]), "doc_id",
                          "winners").to_pandas()
    got = set(zip(out["doc_id"], out["__pidx"]))
    assert got == want
    assert len(out) == len(want)     # no duplicate winners emitted
