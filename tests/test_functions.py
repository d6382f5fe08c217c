"""Dedup / similarity / textstats / multimodal operator tests over the
driver-generated testdata tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import duckdb


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb_ds(ray_session, sf_dir):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup_matches_sql(docs_ds, sf_dir):
    from tantivy4java_ray.functions.dedup import exact_dedup
    mine = sorted(exact_dedup(docs_ds, "text", "doc_id")
                  .to_pandas()["doc_id"])
    sql = duckdb.sql(
        f"SELECT min(doc_id) AS doc_id FROM "
        f"'{sf_dir}/documents.parquet' GROUP BY text ORDER BY 1"
    ).fetchdf()["doc_id"].tolist()
    assert mine == sql


def test_minhash_finds_planted_duplicates(ray_session):
    import ray.data
    from tantivy4java_ray.functions.dedup import minhash_dedup
    rng = np.random.default_rng(0)
    base = [" ".join(f"w{rng.integers(0, 500):03d}" for _ in range(80))
            for _ in range(40)]
    texts = list(base)
    # plant near-dups: copy docs 0..4 with one word changed
    for i in range(5):
        toks = base[i].split()
        toks[10] = "CHANGED"
        texts.append(" ".join(toks))
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    survivors, pairs = minhash_dedup(ds, "text", "doc_id", threshold=0.7)
    dropped = set(range(len(texts))) - set(survivors)
    assert dropped == {40, 41, 42, 43, 44}
    assert set(zip(pairs["a"], pairs["b"])) >= {(i, 40 + i)
                                                for i in range(5)}


def test_minhash_shuffle_payload_is_thin(ray_session):
    # the bucket shuffle must carry ONLY (band_hash, id) — 16 B/row —
    # never the 1 KB signature repeated once per band (round-2 finding)
    import ray.data
    from tantivy4java_ray.functions.dedup import MinHasher, _band_table
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["alpha beta gamma delta epsilon"] * 2}))
    sig_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(col="text", id_col="doc_id",
                                   num_perm=64, bands=16, shingle_size=3),
        batch_format="pyarrow", concurrency=1, num_cpus=1)
    band = _band_table(sig_ds, "doc_id")
    assert set(band.schema().names) == {"band_hash", "doc_id"}
    t = band.to_pandas()
    assert len(t) == 2 * 16  # bands rows per doc, ids repeated
    # identical texts -> identical band hashes per band slot
    a = t[t.doc_id == 0]["band_hash"].to_numpy()
    b = t[t.doc_id == 1]["band_hash"].to_numpy()
    assert (np.sort(a) == np.sort(b)).all()


def test_simhash_pairs(ray_session):
    import ray.data
    from tantivy4java_ray.functions.dedup import simhash_pairs, simhash64
    texts = ["alpha beta gamma delta epsilon zeta " * 10,
             "alpha beta gamma delta epsilon zeta " * 10,
             "totally different words entirely here now " * 10]
    sims = simhash64(texts)
    assert sims[0] == sims[1] != sims[2]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": texts}))
    pairs = simhash_pairs(ds, "text", "doc_id").to_pandas()
    pairs = pairs.drop_duplicates(subset=["a", "b"])
    assert list(zip(pairs["a"], pairs["b"])) == [(0, 1)]


def test_ngram_jaccard_exact_values(ray_session):
    import ray.data
    from tantivy4java_ray.functions.dedup import ngram_jaccard_pairs
    a = "one two three four five six seven eight nine ten"
    b = "one two three four five six seven eight nine eleven"
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": [a, b]}))
    pairs = ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.3,
                                shingle_size=3)
    assert len(pairs) == 1
    # 8 shingles each, 7 shared -> J = 7/9
    assert pairs.iloc[0]["jaccard"] == pytest.approx(7 / 9)


def test_embedding_neardup(ray_session):
    import ray.data
    from tantivy4java_ray.functions.dedup import embedding_neardup_pairs
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    vecs = np.vstack([vecs, vecs[0] * 1.001, vecs[5] * 0.999])
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": list(map(list, vecs))}))
    pairs = embedding_neardup_pairs(ds, "embedding", "vec_id", tau=0.999)
    assert {(int(r.a), int(r.b)) for r in pairs.itertuples()} == {
        (0, 30), (5, 31)}


def test_topk_cosine_matches_duckdb(emb_ds, sf_dir):
    from tantivy4java_ray.functions.similarity import topk_cosine
    q = np.stack(emb_ds.take(1)[0]["embedding"])[None, :][0]
    res = topk_cosine(emb_ds, np.asarray([q]), k=5)
    sql = duckdb.sql(f"""
        SELECT e.vec_id,
               list_cosine_similarity(e.embedding, q.embedding) AS score
        FROM '{sf_dir}/embeddings.parquet' e,
             (SELECT embedding FROM '{sf_dir}/embeddings.parquet'
              WHERE vec_id = 0) q
        ORDER BY score DESC, vec_id LIMIT 5""").fetchdf()
    assert res["vec_id"].tolist() == sql["vec_id"].tolist()
    np.testing.assert_allclose(res["score"], sql["score"], rtol=1e-5)


def test_ivf_recall(emb_ds):
    from tantivy4java_ray.functions.similarity import (ivf_topk_cosine,
                                                       topk_cosine)
    rows = emb_ds.take(3)
    q = np.stack([np.asarray(r["embedding"]) for r in rows])
    exact = topk_cosine(emb_ds, q, k=10)
    approx = ivf_topk_cosine(emb_ds, q, k=10, n_clusters=8, nprobe=4)
    # recall@10 >= 0.5 with nprobe=half the clusters
    for qi in range(3):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        assert len(e & a) / 10 >= 0.5


def test_token_stats_matches_duckdb(docs_ds, sf_dir):
    from tantivy4java_ray.functions.textstats import token_stats
    mine = token_stats(docs_ds).to_pandas().sort_values("doc_id")
    sql = duckdb.sql(f"""
        SELECT doc_id,
          len(list_filter(regexp_split_to_array(lower(text),
              '[^a-z0-9]+'), x -> x <> '')) AS n_tokens
        FROM '{sf_dir}/documents.parquet' ORDER BY doc_id""").fetchdf()
    assert mine["n_tokens"].tolist() == sql["n_tokens"].tolist()


def test_language_id(ray_session):
    import ray.data
    from tantivy4java_ray.functions.textstats import language_id
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the cat is on the mat and it is happy with that",
                 "der Hund ist nicht auf dem Tisch und das ist gut",
                 "le chat est dans la maison avec les enfants",
                 "xyzzy qwerty asdf"]}))
    out = language_id(ds).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist()[:3] == ["en", "de", "fr"]
    assert out["lang_pred"].tolist()[3] == "und"


def test_quality_scores(docs_ds):
    from tantivy4java_ray.functions.textstats import quality_scores
    out = quality_scores(docs_ds).to_pandas()
    assert (out["quality"] >= 0).all() and (out["quality"] <= 1).all()
    assert (out["alpha_ratio"] > 0.5).all()  # plain word soup


def test_quality_langid_match_their_sql_oracles(sf_dir):
    """The quality composite and language-ID heuristic are plain f64
    arithmetic over the token stream — bit-identical to their DuckDB
    oracle_sql() entries (half-away ROUND on both sides; integer-weighted
    sums are exact in f64 so summation order is irrelevant)."""
    import pyarrow.parquet as pq

    import __ray_entry__ as m
    from tantivy4java_ray.functions.textstats import LanguageId, quality_batch
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", t)
    sql = m.oracle_sql()
    for name, mine in (("quality", quality_batch(t)),
                       ("language_id", LanguageId()(t))):
        mine = mine.to_pandas().sort_values("doc_id").reset_index(drop=True)
        orc = (con.sql(sql[name]).df()
               .sort_values("doc_id").reset_index(drop=True)[mine.columns])
        for c in mine.columns:
            a, b = mine[c].to_numpy(), orc[c].to_numpy()
            if a.dtype.kind == "f":
                assert np.array_equal(a, b), (name, c)
            else:
                assert (pd.Series(a).astype(str)
                        == pd.Series(b).astype(str)).all(), (name, c)


def test_round6_half_away():
    """1/128 is an exact binary half at 6dp: np.round gives 0.007812
    (half-even) but SQL ROUND gives 0.007813 — _round6 must match SQL."""
    from tantivy4java_ray.functions.textstats import _round6
    assert _round6(np.array([1.0 / 128]))[0] == 0.007813
    assert duckdb.sql("SELECT ROUND(1.0/128, 6)::DOUBLE AS r").fetchone()[0] \
        == 0.007813


def test_fingerprints_match_duckdb(docs_ds, sf_dir):
    from tantivy4java_ray.functions.textstats import fingerprints
    mine = fingerprints(docs_ds).to_pandas().sort_values("doc_id")
    sql = duckdb.sql(f"SELECT doc_id, md5(text) AS md5 FROM "
                     f"'{sf_dir}/documents.parquet' ORDER BY doc_id").fetchdf()
    assert mine["md5"].tolist() == sql["md5"].tolist()


def test_multimodal_plumbing(ray_session):
    import ray.data
    from tantivy4java_ray.stages.multimodal import (decode_images,
                                                    sample_audio_frames)
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "image": [b"\x01\x02fakejpg", b"\x03\x04fakepng"],
        "audio": [b"fakewav1", b"fakewav2"]}))
    imgs = decode_images(ds, size=(8, 8), fake=True).to_pandas()
    assert list(imgs.columns) == ["doc_id", "pixels", "height", "width",
                                  "orig_bytes"]
    assert len(imgs.iloc[0]["pixels"]) == 8 * 8 * 3
    # deterministic: same payload -> same pixels
    imgs2 = decode_images(ds, size=(8, 8), fake=True).to_pandas()
    assert np.array_equal(np.stack(imgs["pixels"]),
                          np.stack(imgs2["pixels"]))
    aud = sample_audio_frames(ds, n_frames=4, fake=True).to_pandas()
    assert len(aud.iloc[0]["frame_energy"]) == 4
    # non-fake raises cleanly
    from tantivy4java_ray.stages.multimodal import ImageDecodeResize
    with pytest.raises(NotImplementedError):
        ImageDecodeResize(fake=False)(pa.table(
            {"doc_id": [0], "image": [b"x"]}))


def test_minhash_dedup_dataset_scale_path(ray_session):
    import ray.data
    from tantivy4java_ray.functions.dedup import minhash_dedup_dataset
    rng = np.random.default_rng(3)
    base = [" ".join(f"w{rng.integers(0, 400):03d}" for _ in range(60))
            for _ in range(20)]
    texts = base + [base[0], base[7]]  # exact dups of 0 and 7
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    out, pairs = minhash_dedup_dataset(ds, "text", "doc_id", threshold=0.9)
    kept = sorted(out.to_pandas()["doc_id"])
    assert kept == list(range(20))  # ids 20, 21 dropped


def test_curation_pipeline_composed(ray_session, sf_dir):
    """score -> filter -> exact-dedup composition equals the single
    DuckDB query that reproduces all three stages (the curation_pipeline
    oracle), including planted exact clones being deduped away."""
    import pyarrow.compute as pc
    import ray.data

    import __ray_entry__ as m
    from tantivy4java_ray.pipelines.curate import curate_documents
    mine = m.queries()["curation_pipeline"](sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    orc = con.sql(m.oracle_sql()["curation_pipeline"]).df()[mine.columns]
    assert len(mine) == len(orc) > 0
    for c in mine.columns:
        a, b = mine[c].to_numpy(), orc[c].to_numpy()
        if a.dtype.kind in "if":
            assert np.array_equal(a, b), c
        else:
            assert (pd.Series(a).astype(str)
                    == pd.Series(b).astype(str)).all(), c
    # the filters are ACTIVE (strict subset) and clones are gone
    n = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(mine) < n
    assert mine["doc_id"].max() < n  # planted ids (>= n) all deduped

    # langs=None keeps every quality-passing doc (filter composability)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    all_langs = curate_documents(ds, min_quality=0.8,
                                 langs=None).to_pandas()
    assert len(all_langs) >= len(mine)


def test_ngram_jaccard_matches_exhaustive_sql_oracle(ray_session, sf_dir):
    """The LSH-bucketed exact-Jaccard pipeline must reproduce an
    EXHAUSTIVE all-pairs DuckDB oracle pair-for-pair: at threshold 0.8
    the corpus's near-dups sit at J >= 0.9 where a 16-band/4-row LSH
    misses with P < 4e-8, so candidate pruning may not lose anything."""
    import __ray_entry__ as m
    mine = m.queries()["dedup_ngram_jaccard"](sf_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.sql(m.oracle_sql()["dedup_ngram_jaccard"]).df()
    assert len(mine) == len(orc) > 0
    assert np.array_equal(mine["a"].to_numpy(np.int64),
                          orc["a"].to_numpy(np.int64))
    assert np.array_equal(mine["b"].to_numpy(np.int64),
                          orc["b"].to_numpy(np.int64))
    assert np.array_equal(mine["jaccard"].to_numpy(),
                          orc["jaccard"].to_numpy())


def test_topk_cosine_tie_contract_and_string_ids(ray_session):
    """Tied kth-boundary scores must break id-ASC inside each block
    (argpartition alone keeps an arbitrary row), and the id column must
    keep the caller's type (string urls)."""
    import ray.data

    from tantivy4java_ray.functions.similarity import topk_cosine
    v = [1.0, 0.0]
    rows = [{"vec_id": i, "embedding": v} for i in range(8)]  # all tied
    ds = ray.data.from_items(rows).repartition(2)
    out = topk_cosine(ds, np.array([v]), k=3)
    assert out["vec_id"].tolist() == [0, 1, 2]
    srows = [{"url": f"u{i:02d}", "embedding": v} for i in range(6)]
    out2 = topk_cosine(ray.data.from_items(srows), np.array([v]),
                       id_col="url", k=2)
    assert out2["url"].tolist() == ["u00", "u01"]


def test_snippet_long_unbroken_prefix():
    """The left word-boundary walk must not push the matched term out of
    the fragment (regression: 1000-char unbroken run before the hit
    returned a snippet without the term)."""
    from tantivy4java_ray.functions.snippet import SnippetGenerator
    from tantivy4java_ray.query import Query
    gen = SnippetGenerator(Query.term("text", "foo"), "text", "default",
                           150)
    snip = gen.snippet_from_text("x" * 1000 + " foo bar")
    assert "<b>foo</b>" in snip


def test_more_like_this_matches_sql_oracle(ray_session, sf_dir):
    """MLT end-to-end in SQL: seed pick, tf*log1p-idf term ranking with
    term-DESC tie-break, top-10 SHOULD, exact-dl BM25 sum, top-25."""
    import __ray_entry__ as m
    mine = m.queries()["more_like_this"](sf_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.sql(m.oracle_sql()["more_like_this"]).df()
    assert np.array_equal(mine["doc_id"].to_numpy(np.int64),
                          orc["doc_id"].to_numpy(np.int64))


def test_snippet_object_fragment_and_ranges():
    # Snippet.java:46-68 shape: getFragment (raw), getHighlighted
    # ([start,end) ranges into the fragment), toHtml (markup rendering)
    from tantivy4java_ray.functions.snippet import Snippet, SnippetGenerator
    from tantivy4java_ray.query import Query

    gen = SnippetGenerator(Query.term("text", "fox"), "text")
    sn = gen.snippet("the quick brown fox jumps over the lazy fox dog")
    assert isinstance(sn, Snippet)
    assert "<b>" not in sn.fragment
    assert [sn.fragment[s:e] for s, e in sn.highlighted] == ["fox", "fox"]
    assert sn.to_html() == gen.snippet_from_text(
        "the quick brown fox jumps over the lazy fox dog")
    assert sn.to_html().count("<b>fox</b>") == 2
    # no match -> empty snippet, all surfaces agree
    empty = gen.snippet("nothing here")
    assert empty.fragment == "" and empty.highlighted == []
    assert empty.to_html() == ""


def test_minhash_estimator_statistics():
    # the (a*x+b) mod 2^64 odd-multiplier family must yield an
    # (empirically) unbiased Jaccard estimator with ~sqrt(J(1-J)/P)
    # spread — guards the hash family against a regression that biases
    # collision probabilities (e.g. even multipliers, low-bit structure)
    from tantivy4java_ray.functions.dedup import MinHasher
    mh = MinHasher("text", "doc_id", 128, 16, 1)
    errs = []
    for trial in range(30):
        shared = [f"s{trial}_{i}" for i in range(60)]
        a = shared + [f"a{trial}_{i}" for i in range(30)]
        b = shared + [f"b{trial}_{i}" for i in range(30)]
        _, s = mh._signatures([" ".join(a), " ".join(b)])
        errs.append(float((s[0] == s[1]).mean()) - 0.5)  # true J = 0.5
    bias = float(np.mean(errs))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert abs(bias) < 0.03, bias      # unbiased within noise
    assert rmse < 0.09, rmse           # ~2x theoretical 0.044
