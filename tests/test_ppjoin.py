"""Prefix-filtered set-similarity join (operators/ppjoin.py)."""

from __future__ import annotations

import itertools
import random
import re

import pytest
from pyspark.sql import Row

from kg_microbe_merge_spark.operators.ppjoin import (
    record_sets,
    set_similarity_join,
)


def _df(spark, docs):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )


def _naive_pairs(docs, threshold, n=1):
    """Naive all-pairs token/shingle-set Jaccard (python oracle)."""
    def toks(text):
        ws = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]
        if n == 1:
            return set(ws)
        if len(ws) < n:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    sets = {i: toks(t) for i, t in enumerate(docs)}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter == 0:
            continue
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:  # raw comparison, like the engine/oracle
            out[(a, b)] = (inter, round(j, 6))
    return out


def _run(spark, docs, threshold, n=1):
    return {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["jaccard"])
        for r in set_similarity_join(
            _df(spark, docs), threshold, n=n
        ).collect()
    }


def test_exact_recall_vs_naive_random_corpus(spark):
    """The pruning theorem, machine-checked: prefix-filtered output ==
    naive all-pairs output on a corpus with heavy stop-token overlap
    (the case the old max_doc_freq cap traded recall on)."""
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(40)]
    stop = "the of and a to in".split()
    docs = []
    for _ in range(40):
        body = rng.sample(vocab, rng.randrange(4, 12)) + rng.sample(stop, 4)
        rng.shuffle(body)
        docs.append(" ".join(body))
    # plant near-dups
    docs.append(docs[0] + " extra")
    docs.append(docs[1])
    for t in (0.5, 0.7, 0.9):
        assert _run(spark, docs, t) == _naive_pairs(docs, t), t


def test_exact_duplicate_and_threshold_one(spark):
    docs = ["alpha beta gamma", "alpha beta gamma", "alpha beta delta"]
    got = _run(spark, docs, 1.0)
    assert got == {(0, 1): (3, 1.0)}


def test_shingle_mode_matches_naive(spark):
    docs = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different text with no overlap here at all",
        "the quick brown fox jumps over the lazy dog",
    ]
    got = _run(spark, docs, 0.3, n=3)
    want = _naive_pairs(docs, 0.3, n=3)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6)


def test_prefix_index_is_smaller_than_full_index(spark):
    """The point of the operator: at threshold t the prefix index
    carries ~(1-t)|x|+1 postings per record, not |x|."""
    from pyspark.sql import functions as F

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(300)]
    docs = [" ".join(rng.sample(vocab, 50)) for _ in range(30)]
    sets = record_sets(_df(spark, docs))
    full = sets.select(F.explode("arr")).count()
    t_micro = 900_000
    plen = (
        F.col("size")
        - F.floor(F.lit(t_micro) * F.col("size") / F.lit(1_000_000))
        + 1
    ).cast("int")
    prefix = sets.select(F.explode(F.slice("arr", 1, plen))).count()
    assert prefix <= full * 0.15, (prefix, full)


def test_rarest_first_canonical_order(spark):
    docs = ["rare1 common", "rare2 common", "common alone"]
    rows = {r["doc_id"]: list(r["arr"]) for r in
            record_sets(_df(spark, docs)).collect()}
    # 'common' has df=3 -> always LAST (never indexed by short prefixes)
    assert rows[0][-1] == "common" and rows[1][-1] == "common"


def test_invalid_threshold_rejected(spark):
    with pytest.raises(ValueError):
        set_similarity_join(_df(spark, ["a"]), 0.0)
    with pytest.raises(ValueError):
        set_similarity_join(_df(spark, ["a"]), 1.5)
