"""Tokenizer goldens (FIXTURES.md F5) — freeze the byte-identical contract
of the reference's SimpleTokenizer + LowerCaser + RemoveLongFilter(255)
(``native/src/text_analyzer.rs:208-244``)."""

import numpy as np
import pyarrow as pa

from tantivy4java_ray.analyzer import (
    TextAnalyzer, get_analyzer, register_tokenizer, tokenize_column,
)


def toks(name, text):
    return get_analyzer(name).tokenize(text)


def toks_pos(name, text):
    return get_analyzer(name).tokenize_with_positions(text)


def test_default_mixed_case():
    # DefaultTokenizerCaseTest.java:44
    assert toks("default", "HELLO World") == ["hello", "world"]


def test_default_punctuation():
    assert toks("default", "it's a test-case") == ["it", "s", "a", "test", "case"]


def test_default_numbers_and_unicode():
    assert toks("default", "Café au_lait 42x") == ["café", "au", "lait", "42x"]


def test_default_empty_and_punct_only():
    assert toks("default", "") == []
    assert toks("default", "!!! ...") == []


def test_default_leading_punct_positions():
    t, p = toks_pos("default", "...alpha bravo, charlie")
    assert t == ["alpha", "bravo", "charlie"]
    assert p == [0, 1, 2]


def test_token_length_limit():
    # 256-byte token dropped, 255-byte kept (text_analyzer.rs:12-14)
    keep = "a" * 255
    drop = "b" * 256
    t, p = toks_pos("default", f"{keep} {drop} tail")
    assert t == [keep, "tail"]
    # positions keep the gap left by the dropped long token
    assert p == [0, 2]


def test_length_limit_is_bytes_not_chars():
    tok = "é" * 128  # 256 bytes utf-8
    assert toks("default", tok) == []
    tok = "é" * 127  # 254 bytes
    assert toks("default", tok) == [tok]


def test_whitespace_tokenizer():
    assert toks("whitespace", "A-b  C_d") == ["a-b", "c_d"]


def test_raw_keyword():
    assert toks("raw", "Hello, World!") == ["Hello, World!"]
    assert toks("keyword", "x" * 1000) == ["x" * 1000]
    assert toks("raw", "") == []


def test_emoji_and_cjk():
    assert toks("default", "héllo 😀 世界") == ["héllo", "世界"]


def test_null_handling():
    out = tokenize_column(pa.array(["a b", None, "", "c"]), get_analyzer("default"))
    assert list(out["row"]) == [0, 0, 3]
    assert list(out["token"]) == ["a", "b", "c"]
    assert list(out["row_token_counts"]) == [2, 0, 0, 1]


def test_vectorized_matches_scalar():
    texts = ["The Quick! brown-fox", "", "  lone  ", "123 abc456 _x_"]
    a = get_analyzer("default")
    out = tokenize_column(pa.array(texts), a)
    for i, text in enumerate(texts):
        mine = [t for t, r in zip(out["token"], out["row"]) if r == i]
        assert mine == a.tokenize(text)


def test_custom_registration():
    register_tokenizer("legacy", TextAnalyzer("legacy", token_limit=40))
    assert toks("legacy", "x" * 41 + " ok") == ["ok"]


def test_row_token_counts_are_doc_lengths():
    out = tokenize_column(pa.array(["one two three", "four"]),
                          get_analyzer("default"))
    assert np.array_equal(out["row_token_counts"], [3, 1])
