"""Extraction robustness: malformed HTML, nested boilerplate, entities,
invalid UTF-8 — all must be deterministic (byte-identical across calls)
and never raise."""

from __future__ import annotations

from kg_microbe_merge_spark.functions.extract import (
    extract_text_py,
    with_extracted_text,
)

CASES = {
    b"<p>unclosed paragraph <div>next": "unclosed paragraph\nnext",
    b"<script><p>inside script</p>": "",        # unclosed script swallows rest
    b"<nav>menu <footer>deep</footer> more</nav><p>body</p>": "body",
    b"<p>a &amp; b &lt;c&gt;</p>": "a & b <c>",
    b"<P>UPPER TAGS</P>": "UPPER TAGS",
    b"plain text, no tags at all": "plain text, no tags at all",
    b"<p>tab\there  multi   space</p>": "tab here multi space",
    b"": "",
}


def test_malformed_html_cases():
    for html, expected in CASES.items():
        assert extract_text_py(html) == expected, html


def test_invalid_utf8_is_deterministic():
    junk = b"<p>ok \xff\xfe broken</p>"
    a = extract_text_py(junk)
    b = extract_text_py(junk)
    assert a == b
    assert "ok" in a and "broken" in a
    assert "�" in a  # replacement char, pinned behavior


def test_udf_matches_python_on_edge_cases(spark):
    rows = [(f"u{i}", h) for i, h in enumerate(CASES)] + [("ujunk", b"<p>\xff</p>")]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r["text"] for r in with_extracted_text(df).collect()}
    for (url, html) in rows:
        assert got[url] == extract_text_py(html), (url, html)
