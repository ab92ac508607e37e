"""Bigram-LM perplexity scoring (operators/ngram_lm.py): python-model
equivalence on a hand-checkable corpus, short-document handling,
ordering sanity (rare bigrams score higher), and the filter wrapper."""

from __future__ import annotations

import math

from pyspark.sql import Row

from kg_microbe_merge_spark.operators.ngram_lm import (
    bigram_instances,
    bigram_lm_scores,
    perplexity_filter,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _python_model(texts, k=0.5):
    """Reference implementation of the exact protocol."""
    insts = []
    for i, t in enumerate(texts):
        toks = " ".join(t.lower().split()).split(" ")
        toks = [x for x in toks if x]
        insts.extend((i, toks[j], toks[j + 1]) for j in range(len(toks) - 1))
    cb: dict = {}
    for _, w1, w2 in insts:
        cb[(w1, w2)] = cb.get((w1, w2), 0) + 1
    cw: dict = {}
    for (w1, _), c in cb.items():
        cw[w1] = cw.get(w1, 0) + c
    v = len({w2 for (_, w2) in cb})
    per_doc: dict = {}
    for i, w1, w2 in insts:
        bits = -math.log2((cb[(w1, w2)] + k) / (cw[w1] + k * v))
        micro = math.floor(bits * 1000000.0 + 0.5)
        n, s = per_doc.get(i, (0, 0))
        per_doc[i] = (n + 1, s + micro)
    out = {}
    for i in range(len(texts)):
        if i in per_doc:
            n, s = per_doc[i]
            out[i] = (n, math.floor(s / n + 0.5) / 1000000.0)
        else:
            out[i] = (0, None)
    return out


def test_bigram_instances_shape(spark):
    df = _docs(spark, ["a b c", "x", "", "p  q"])
    rows = sorted(
        (r["doc_id"], r["w1"], r["w2"])
        for r in bigram_instances(df).collect()
    )
    assert rows == [(0, "a", "b"), (0, "b", "c"), (3, "p", "q")]


def test_scores_match_python_model(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "on the mat the cat sat",
        "zz yy xx ww",
        "solo",
    ]
    df = _docs(spark, texts)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_bits"])
        for r in bigram_lm_scores(df).collect()
    }
    assert got == _python_model(texts)


def test_rare_bigrams_score_higher(spark):
    # 10 fluent repeats vs 1 doc of unique junk: junk must score higher
    texts = ["the cat sat on the mat"] * 10 + ["qq ww ee rr tt yy"]
    df = _docs(spark, texts)
    scores = {
        r["doc_id"]: r["avg_bits"] for r in bigram_lm_scores(df).collect()
    }
    assert scores[10] > scores[0]


def test_perplexity_filter_drops_junk_and_short(spark):
    texts = ["the cat sat on the mat"] * 10 + [
        "qq ww ee rr tt yy",  # junk → high bits
        "solo",  # < 2 tokens → unscorable, dropped
    ]
    df = _docs(spark, texts)
    scores = {
        r["doc_id"]: r["avg_bits"] for r in bigram_lm_scores(df).collect()
    }
    cut = (scores[0] + scores[10]) / 2
    kept = {r["doc_id"] for r in perplexity_filter(df, max_bits=cut).collect()}
    assert kept == set(range(10))
