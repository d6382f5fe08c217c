"""Round-4 widened randomized differential: every match-only leaf kind
(fuzzy / regex / wildcard / term-range / fast-range / exists joins the
term/term_set/phrase/bool/dismax set of test_invariance.py) checked
against an INDEPENDENT naive model built straight from the parquet —
its own OSA edit-distance DP, its own regex translation, its own
inverted index — plus cross-mode parity: the same random trees must
return identical top-k (score, doc) lists from the directory reader,
the single-file ``.split`` bundle reader, and the leaf/root
``ShardedSearchPool``.

Reference semantics mirrored (not imported from the engine):
fuzzy = Damerau-Levenshtein with optional transposition cost 1 and
FuzzyTermQuery::new_prefix prefix matching (min distance over term
prefixes); regex/wildcard = anchored fullmatch over dictionary terms
with '.' matching newline (tantivy-fst has no line semantics,
native/src/query/wildcard.rs); STRING/TEXT range = lexicographic
dictionary window; DATE range / exists = fast-column compare.
"""

import re
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from tantivy4java_ray.analyzer import get_analyzer
from tantivy4java_ray.pipelines.build import build_index
from tantivy4java_ray.pipelines.bundle import bundle_index, split_url
from tantivy4java_ray.pipelines.search import IndexReader
from tantivy4java_ray.query import Occur, Query
from tantivy4java_ray.schema import IndexSchema
from tantivy4java_ray.sources.webpages import write_webpages
from tantivy4java_ray.stages.extract import extract_text

BASE = "/tmp/t4jr_diff_r4d"
N = 1400
K = 15


def _schema():
    s = IndexSchema()
    s.add_text_field("text", index_option="position")
    s.add_string_field("lang", fast=True)
    s.add_date_field("warc_ts", fast=True)
    return s


class Naive:
    """Independent model: inverted index + per-doc token lists read
    straight from the source parquet (html fallback applied the same
    way the build is configured to)."""

    def __init__(self, paths):
        ana = get_analyzer("default")
        self.tokens: list[list[str]] = []
        self.lang: list[str | None] = []
        self.ts: list[np.datetime64 | None] = []
        for p in paths:
            t = pq.read_table(p, columns=["text", "html", "lang",
                                          "warc_ts"])
            for txt, h in zip(t.column("text").to_pylist(),
                              t.column("html").to_pylist()):
                self.tokens.append(ana.tokenize(
                    txt if txt is not None else extract_text(h)))
            self.lang.extend(t.column("lang").to_pylist())
            self.ts.extend(t.column("warc_ts").to_pylist())
        self.n = len(self.tokens)
        self.post: dict[str, set[int]] = {}
        for i, toks in enumerate(self.tokens):
            for tok in set(toks):
                self.post.setdefault(tok, set()).add(i)
        self.vocab = sorted(self.post)
        # keyword analyzer on '' emits no token -> '' is NOT indexed
        self.lang_post: dict[str, set[int]] = {}
        for i, v in enumerate(self.lang):
            if v:
                self.lang_post.setdefault(v, set()).add(i)
        self.all = set(range(self.n))

    # -- independent OSA Damerau-Levenshtein ------------------------------
    @staticmethod
    def _osa(a: str, b: str, transposition: bool) -> int:
        la, lb = len(a), len(b)
        prev2: list[int] | None = None
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cost = 0 if a[i - 1] == b[j - 1] else 1
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + cost)
                if (transposition and i > 1 and j > 1
                        and a[i - 1] == b[j - 2]
                        and a[i - 2] == b[j - 1]):
                    cur[j] = min(cur[j], prev2[j - 2] + 1)
            prev2, prev = prev, cur
        return prev[lb]

    def _fuzzy_terms(self, value: str, dist: int, transposition: bool,
                     prefix: bool) -> set[str]:
        out = set()
        for t in self.vocab:
            if prefix:
                if t.startswith(value):
                    out.add(t)
                    continue
                d = min(self._osa(value, t[:j], transposition)
                        for j in range(len(t) + 1))
            else:
                d = self._osa(value, t, transposition)
            if d <= dist:
                out.add(t)
        return out

    def _union(self, terms) -> set[int]:
        out: set[int] = set()
        for t in terms:
            out |= self.post.get(t, set())
        return out

    def eval(self, q: Query) -> set[int]:
        k, p = q.kind, q.params
        if k == "term":
            if p[0] == "lang":
                return set(self.lang_post.get(p[1], set()))
            return set(self.post.get(p[1], set()))
        if k == "term_set":
            return self._union(p[1])
        if k == "all":
            return set(self.all)
        if k == "phrase":
            words = [w for _pos, w in p[1]]
            out = set()
            for i, toks in enumerate(self.tokens):
                for j in range(len(toks) - len(words) + 1):
                    if toks[j:j + len(words)] == words:
                        out.add(i)
                        break
            return out
        if k == "fuzzy":
            field, value, dist, transp, prefix = p
            return self._union(self._fuzzy_terms(value, dist, transp,
                                                 prefix))
        if k in ("regex", "wildcard"):
            field, pattern = p[0], p[1]
            if k == "wildcard":
                pattern = pattern.lower()  # default analyzer lowercases
                pattern = "".join(
                    "[\\s\\S]*" if c == "*" else "[\\s\\S]" if c == "?"
                    else re.escape(c) for c in pattern)
            cre = re.compile(pattern, re.DOTALL)
            return self._union(t for t in self.vocab
                               if cre.fullmatch(t))
        if k == "range":
            field, lo, hi, il, ih = p
            if field == "text":
                return self._union(
                    t for t in self.vocab
                    if (lo is None or (t >= lo if il else t > lo))
                    and (hi is None or (t <= hi if ih else t < hi)))
            if field == "lang":
                return self._union_lang(lo, hi, il, ih)
            # warc_ts fast-column compare
            out = set()
            for i, v in enumerate(self.ts):
                if v is None:
                    continue
                if lo is not None and not (v >= lo if il else v > lo):
                    continue
                if hi is not None and not (v <= hi if ih else v < hi):
                    continue
                out.add(i)
            return out
        if k == "exists":
            if p[0] == "lang":
                return {i for i, v in enumerate(self.lang)
                        if v is not None}
            return {i for i, v in enumerate(self.ts) if v is not None}
        if k == "bool":
            musts = [s for o, s in p if o == Occur.MUST]
            shoulds = [s for o, s in p if o == Occur.SHOULD]
            nots = [s for o, s in p if o == Occur.MUST_NOT]
            if musts:
                cur = set.intersection(*[self.eval(s) for s in musts])
            elif shoulds:
                cur = set.union(*[self.eval(s) for s in shoulds])
            else:
                return set()
            for s in nots:
                cur -= self.eval(s)
            return cur
        if k == "dismax":
            subs = [self.eval(s) for s in p[0]]
            return set.union(*subs) if subs else set()
        if k in ("boost", "const"):
            return self.eval(p[0])
        raise AssertionError(k)

    def _union_lang(self, lo, hi, il, ih) -> set[int]:
        out: set[int] = set()
        for v, docs in self.lang_post.items():
            if lo is not None and not (v >= lo if il else v > lo):
                continue
            if hi is not None and not (v <= hi if ih else v < hi):
                continue
            out |= docs
        return out


@pytest.fixture(scope="module")
def env(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    paths = write_webpages(f"{BASE}/data", N, n_files=2,
                           rows_per_row_group=350)
    idx = f"{BASE}/idx"
    build_index(paths, idx, _schema(), num_shards=4,
                html_fallback=("text", "html"),
                target_docs_per_partition=400)
    bundle = f"{BASE}/web.split"
    bundle_index(idx, bundle)
    yield {"idx": idx, "bundle": bundle, "naive": Naive(paths)}
    shutil.rmtree(BASE, ignore_errors=True)


def _ts(naive: Naive, frac: float):
    vals = sorted(v for v in naive.ts if v is not None)
    return vals[min(int(frac * len(vals)), len(vals) - 1)]


def _leaf_pool(naive: Naive):
    """One instance of every leaf kind (used directly AND as the leaf
    source for random trees)."""
    return [
        Query.term("text", "needleterm"),
        Query.term("text", "w0042"),
        Query.term("text", "zzz_absent"),
        Query.term("lang", "de"),
        Query.term("lang", "zz"),
        Query.term_set("text", ["w0000", "w0101", "alpha"]),
        Query.phrase("text", ["alpha", "bravo", "charlie"]),
        Query.fuzzy_term("text", "w0042", 1),
        Query.fuzzy_term("text", "needleterm", 2,
                         transposition_cost_one=False),
        Query.fuzzy_term("text", "neadlet", 2, prefix=True),
        Query.fuzzy_term("text", "w004", 1, prefix=True),
        Query.fuzzy_term("text", "barvo", 1),       # transposition
        Query.regex("text", "w00[0-9]{2}"),
        Query.regex("text", "need.*"),
        Query.regex("text", "(alpha|bravo)"),
        Query.regex("text", "w0.4."),
        Query.wildcard("text", "w01*"),
        Query.wildcard("text", "need*term"),
        Query.wildcard("text", "w0?4?"),
        Query.wildcard("text", "*term"),
        Query.range("text", "w0100", "w0120"),
        Query.range("text", "needleterm", None, include_lower=False),
        Query.range("lang", "d", "f"),
        Query.range("lang", "de", "en", include_upper=False),
        Query.range("warc_ts", _ts(naive, 0.2), _ts(naive, 0.6)),
        Query.range("warc_ts", None, _ts(naive, 0.3),
                    include_upper=False),
        Query.exists("lang"),
        Query.exists("warc_ts"),
        Query.all(),
    ]


def test_every_leaf_kind_matches_naive(env):
    r = IndexReader(env["idx"])
    naive = env["naive"]
    for q in _leaf_pool(naive):
        got, _ = r.evaluate(q)
        assert set(got.tolist()) == naive.eval(q), repr(q)


def test_random_trees_all_leaf_kinds_match_naive(env):
    r = IndexReader(env["idx"])
    naive = env["naive"]
    leaves = _leaf_pool(naive)
    rng = np.random.default_rng(41)

    def rand_tree(depth: int) -> Query:
        if depth == 0 or rng.random() < 0.35:
            return leaves[int(rng.integers(0, len(leaves)))]
        roll = rng.random()
        kids = [rand_tree(depth - 1) for _ in range(2)]
        if roll < 0.5:
            occ = [Occur.MUST, Occur.SHOULD, Occur.MUST_NOT]
            return Query.boolean([
                (occ[int(rng.integers(0, 3))], kids[0]),
                (occ[int(rng.integers(0, 2))], kids[1])])
        if roll < 0.7:
            return Query.disjunction_max(kids, 0.4)
        if roll < 0.85:
            return Query.boost(kids[0], 1.7)
        return Query.const_score(kids[0], 2.5)

    trees = [rand_tree(3) for _ in range(80)]
    for q in trees:
        got, _ = r.evaluate(q)
        assert set(got.tolist()) == naive.eval(q), repr(q)


def test_cross_mode_topk_parity(env):
    """The SAME random trees return identical (score, doc) top-k from
    the directory reader, the .split bundle reader, and the leaf/root
    sharded pool (pool scores ride an f64 wire; exact up to f32 repr)."""
    from tantivy4java_ray.pipelines.search import ShardedSearchPool
    full = IndexReader(env["idx"])
    bundled = IndexReader(split_url(env["bundle"]))
    naive = env["naive"]
    leaves = _leaf_pool(naive)
    rng = np.random.default_rng(1759)

    def rand_tree(depth: int) -> Query:
        if depth == 0 or rng.random() < 0.4:
            return leaves[int(rng.integers(0, len(leaves)))]
        roll = rng.random()
        kids = [rand_tree(depth - 1) for _ in range(2)]
        if roll < 0.55:
            occ = [Occur.MUST, Occur.SHOULD, Occur.MUST_NOT]
            return Query.boolean([
                (occ[int(rng.integers(0, 3))], kids[0]),
                (occ[int(rng.integers(0, 2))], kids[1])])
        if roll < 0.8:
            return Query.disjunction_max(kids, 0.3)
        return Query.boost(kids[0], 2.0)

    trees = [rand_tree(2) for _ in range(40)]
    want = [full.search(q, K).hits for q in trees]
    for q, w in zip(trees, want):
        got = bundled.search(q, K).hits
        assert got == w, f"bundle mismatch: {repr(q)}"
    pool = ShardedSearchPool(env["idx"], num_actors=3)
    try:
        got_many = pool.search_many(trees, limit=K)
        for q, w, g in zip(trees, want, got_many):
            assert [h[1] for h in g] == [h[1] for h in w], repr(q)
            np.testing.assert_allclose(
                [h[0] for h in g], [h[0] for h in w], rtol=1e-6,
                err_msg=repr(q))
    finally:
        pool.shutdown()
