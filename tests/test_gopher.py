"""Gopher-style quality rules (functions/gopher.py): every signal is
pinned against a pure-Python twin (same micro round protocol), the
composite filter keeps/drops the right documents, and the whole signal
plan is exchange-free."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.gopher import (
    DEFAULT_THRESHOLDS,
    gopher_filter,
    gopher_keep,
    gopher_signals,
)


# ---------------------------------------------------------------- twin
def _micro6(x: float) -> float:
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _toks(text: str) -> list[str]:
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    return [t for t in norm.split(" ") if t]


def _grams(ts: list[str], n: int) -> list[str]:
    return [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]


def py_signals(text: str) -> dict:
    ts = _toks(text)
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    nlen, n = len(norm), len(ts)

    def ratio(num, den):
        return _micro6(num / den) if den > 0 else 0.0

    def top_frac(k):
        g = _grams(ts, k)
        if not g or nlen == 0:
            return 0.0
        c = Counter(g)
        best = max(c.values())
        gram = min(x for x, v in c.items() if v == best)
        return ratio(best * len(gram), nlen)

    def dup_frac(k):
        c = Counter(_grams(ts, k))
        mass = sum(v * len(x) for x, v in c.items() if v >= 2)
        return min(1.0, ratio(mass, nlen))

    lines = [l.strip() for l in text.split("\n")]
    lines = [l for l in lines if l]
    return {
        "n_tok": n,
        "mean_word_len": ratio(nlen - (n - 1), n) if n > 0 else 0.0,
        "symbol_word_ratio": ratio(
            text.count("#") + text.count("..."), n
        ),
        "alpha_word_frac": ratio(
            sum(1 for t in ts if re.search("[a-z]", t)), n
        ),
        "top_2gram_frac": top_frac(2),
        "top_3gram_frac": top_frac(3),
        "dup_5gram_frac": dup_frac(5),
        "dup_line_frac": ratio(len(lines) - len(set(lines)), len(lines)),
    }


DOCS = [
    ("d0", "The quick brown fox jumps over the lazy dog near the river bank today"),
    ("d1", ""),
    ("d2", "   \t  "),
    ("d3", "spam spam spam spam spam spam spam spam"),
    ("d4", "buy now buy now buy now limited offer buy now buy now act fast"),
    ("d5", "### code ### block ### with ### many ### symbols ... and ... dots ..."),
    ("d6", "12 34 56 78 90 11 22 33 44 55"),
    ("d7", "one two three four five six seven one two three four five six seven eight"),
    ("d8", "line one\nline two\nline one\nline three\nline one\n"),
    ("d9", "a b a b a b a b a b a b"),
    ("d10", "Normal english prose with a reasonable mix of common words and no weird repetition at all here"),
    ("d11", "x"),
]


@pytest.fixture(scope="module")
def sig_rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    out = gopher_signals(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_signals_match_python_twin(sig_rows):
    for doc_id, text in DOCS:
        want = py_signals(text)
        got = sig_rows[doc_id]
        for k, v in want.items():
            assert got[k] == pytest.approx(v, abs=0), (doc_id, k, got[k], v)


def test_known_values(sig_rows):
    # d3: all-identical tokens — top bigram "spam spam" occurs 7×,
    # covering 7*9=63 chars of the 39-char text → capped ratio > 1 is
    # NOT capped for top (only dup is) but micro-pinned
    assert sig_rows["d3"]["n_tok"] == 8
    assert sig_rows["d3"]["dup_5gram_frac"] == 1.0  # capped
    assert sig_rows["d1"]["n_tok"] == 0
    assert sig_rows["d1"]["mean_word_len"] == 0.0
    assert sig_rows["d2"]["n_tok"] == 0
    # d8: 5 non-empty lines, "line one" ×3 → 2 duplicate lines / 5
    assert sig_rows["d8"]["dup_line_frac"] == _micro6(2 / 5)
    # d5: 5 '###' runs = 15 hashes + 3 '...' over 15 tokens
    assert sig_rows["d5"]["symbol_word_ratio"] == _micro6((15 + 3) / 15)
    # d6: digits only → no alphabetic words
    assert sig_rows["d6"]["alpha_word_frac"] == 0.0


def test_keep_and_filter(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    kept = gopher_keep(gopher_signals(df))
    decisions = {r["doc_id"]: r["keep"] for r in kept.collect()}
    # clean prose passes; empty / repetition / symbol / digit docs fail
    assert decisions["d0"] and decisions["d10"]
    for bad in ("d1", "d2", "d3", "d5", "d6", "d9", "d11"):
        assert not decisions[bad], bad

    filtered = gopher_filter(df)
    ids = {r["doc_id"] for r in filtered.collect()}
    assert ids == {d for d, k in decisions.items() if k}
    assert filtered.columns == ["doc_id", "text"]  # helpers dropped


def test_signal_plan_is_exchange_free(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    plan = gopher_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    fplan = gopher_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in fplan


def test_thresholds_override(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    # loosen everything -> every non-empty doc with >=1 token survives
    loose = {
        "min_n_tok": 1,
        "min_mean_word_len": 0.0,
        "max_mean_word_len": 1e9,
        "max_symbol_word_ratio": 1e9,
        "min_alpha_word_frac": 0.0,
        "max_top_2gram_frac": 1e9,
        "max_top_3gram_frac": 1e9,
        "max_dup_5gram_frac": 1.0,
    }
    ids = {r["doc_id"] for r in gopher_filter(df, thresholds=loose).collect()}
    assert ids == {d for d, t in DOCS if _toks(t)}
    assert set(DEFAULT_THRESHOLDS) == set(loose)
