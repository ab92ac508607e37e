"""BM25 retrieval (operators/bm25.py): scores match a pure-Python
twin, ranking/tiebreak is deterministic, non-matching docs are absent,
and the scoring pass is join-free (stats inlined as literals)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from kg_microbe_merge_spark.operators.bm25 import bm25_topk

DOCS = [
    ("d1", "spark shuffles the hash join across partitions"),
    ("d2", "a broadcast hash join avoids the shuffle for small tables"),
    ("d3", "columnar storage formats with vectorized execution"),
    ("d4", "hash hash hash everywhere hash"),
    ("d5", "entirely unrelated prose about fermentation pathways"),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75, min_len=2):
    toked = {
        i: [t for t in " ".join(txt.lower().split()).split(" ") if len(t) >= min_len]
        for i, txt in docs
    }
    n = len(toked)
    avgdl = sum(len(t) for t in toked.values()) / float(n)
    df = {t: sum(1 for tok in toked.values() if t in tok) for t in terms}
    out = {}
    for i, tok in toked.items():
        s = 0.0
        for t in terms:
            tf = float(tok.count(t))
            idf = math.log(1.0 + (float(n - df[t]) + 0.5) / (float(df[t]) + 0.5))
            s = s + idf * tf * (k1 + 1.0) / (
                tf + k1 * ((1.0 - b) + b * len(tok) / avgdl)
            )
        s = math.floor(s * 1e6 + 0.5) / 1e6
        if s > 0:
            out[i] = s
    return out


def _df(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in DOCS]
    )


def test_scores_match_python_twin(spark):
    got = {
        r.doc_id: r.score
        for r in bm25_topk(_df(spark), ["hash", "join"], k=10).collect()
    }
    assert got == _py_bm25(DOCS, ["hash", "join"])


def test_ranking_saturation_and_absence(spark):
    rows = bm25_topk(_df(spark), ["hash", "join"], k=10).collect()
    ids = [r.doc_id for r in rows]
    # d5 never matches; d3 never matches
    assert "d5" not in ids and "d3" not in ids
    # scores strictly ordered desc, doc_id tiebreak asc
    assert rows == sorted(rows, key=lambda r: (-r.score, r.doc_id))
    # tf saturation: d4 (hash x5, dl 5) does NOT score 5x d1
    by = {r.doc_id: r.score for r in rows}
    assert by["d4"] < 5 * by["d1"]
    # both-term docs beat single-term spam of the commoner term
    assert by["d1"] > 0 and by["d2"] > 0


def test_k_limits_and_empty_query(spark):
    assert bm25_topk(_df(spark), ["hash"], k=1).count() == 1
    with pytest.raises(ValueError):
        bm25_topk(_df(spark), [])


def test_scoring_pass_is_join_free(spark):
    plan = bm25_topk(_df(spark), ["hash", "join"], k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
