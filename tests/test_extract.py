"""Goldens freezing the deterministic html->text extractor (the per-row
"byte-identical extracted text per url" fallback; FIXTURES.md F1)."""

import pyarrow as pa

from tantivy4java_ray.stages.extract import extract_text, fill_text_from_html


def test_basic_structure():
    html = (b"<html><head><title>T5</title><script>var x=1;</script></head>"
            b"<body><p>Hello <b>world</b>.</p><p>Second&nbsp;para &amp; "
            b"more.</p></body></html>")
    assert extract_text(html) == "T5\nHello world .\nSecond\xa0para & more."


def test_scripts_styles_comments_stripped():
    html = (b"<style>.x{}</style><script>alert('hi')</script>"
            b"<!-- secret -->visible<noscript>no js</noscript>")
    assert extract_text(html) == "visible"


def test_block_tags_become_newlines():
    html = b"<div>a</div><div>b</div><br>c<li>d</li>"
    assert extract_text(html) == "a\nb\nc\nd"


def test_whitespace_collapsed():
    html = b"<p>a    b\t\tc</p>\n\n\n<p>d</p>"
    assert extract_text(html) == "a b c\nd"


def test_entities_decoded():
    assert extract_text(b"<p>&lt;tag&gt; &#65; &quot;q&quot;</p>") == \
        '<tag> A "q"'


def test_invalid_utf8_replaced():
    assert extract_text(b"<p>ok \xff\xfe bad</p>") == "ok �� bad"


def test_empty_and_none():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"<script>only</script>") == ""


def test_deterministic():
    html = b"<html><body><p>stable output</p></body></html>"
    assert extract_text(html) == extract_text(html) == "stable output"


def test_fill_text_from_html_only_touches_nulls():
    text = pa.array(["keep me", None, "also keep"])
    html = pa.array([b"<p>ignored</p>", b"<p>extracted</p>", b"<p>x</p>"],
                    pa.binary())
    out = fill_text_from_html(text, html)
    assert out.to_pylist() == ["keep me", "extracted", "also keep"]


def test_fill_no_nulls_is_zero_copy_passthrough():
    text = pa.array(["a", "b"])
    html = pa.array([b"x", b"y"], pa.binary())
    assert fill_text_from_html(text, html) is text
