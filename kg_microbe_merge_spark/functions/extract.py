"""HTML → main-text extraction (trafilatura-equivalent for the synthetic
corpus), as an Arrow-vectorized pandas UDF.

The per-url invariant (BASELINE.json input_hint) is byte-identical output
between the distributed Spark path and the single-threaded reference
implementation — both call the same pure function
:func:`extract_text_py`, and the pandas UDF pins the dtype round-trip so
Arrow never coerces (empty string and null are distinguished: null html →
null text; html with no content → empty string).

Design: stdlib ``html.parser`` (no external deps in this image), dropping
boilerplate containers (script/style/nav/header/footer/aside/form) and
emitting block-level text joined by single newlines, with per-block
whitespace normalization. Deterministic and pure — Spark may re-execute
tasks safely (speculative execution, stage retry).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SKIP_TAGS = frozenset(
    {"script", "style", "nav", "header", "footer", "aside", "form", "noscript"}
)
_BLOCK_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "div", "article", "section",
     "td", "th", "blockquote", "pre", "title"}
)
_WS_RE = re.compile(r"\s+")


class _MainTextParser(HTMLParser):
    """Collects text outside boilerplate containers, one entry per block."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._blocks: list[str] = []
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS and self._skip_depth == 0:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS and self._skip_depth == 0:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth == 0:
            self._buf.append(data)

    def _flush(self):
        chunk = _WS_RE.sub(" ", "".join(self._buf)).strip()
        if chunk:
            self._blocks.append(chunk)
        self._buf = []

    def result(self) -> str:
        self._flush()
        return "\n".join(self._blocks)


def extract_text_py(html: bytes | None) -> str | None:
    """Pure, deterministic HTML→text. THE reference implementation: the
    distributed path must match it byte-for-byte per url."""
    if html is None:
        return None
    p = _MainTextParser()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    return p.result()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched wrapper over :func:`extract_text_py`. ``object``
    dtype end-to-end: bytes/None in, str/None out — no NaN coercion."""
    return html.map(lambda b: extract_text_py(b) if b is not None else None)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Engine stage: add/replace the extracted-text column. Rows that
    already carry pre-extracted text keep it (the input contract allows
    ``text`` to be pre-populated)."""
    if out_col in df.columns:
        return df.withColumn(
            out_col,
            F.coalesce(F.col(out_col), extract_text_udf(F.col(html_col))),
        )
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
