"""Deterministic negative sampling (operators/negatives.py):
python-model equivalence, CDF interval semantics, partitioning
invariance, and the zero-extra-shuffle plan shape."""

from __future__ import annotations

import bisect
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.hashing import hash60_py
from kg_microbe_merge_spark.operators.negatives import (
    UnigramCDF,
    _power_micro,
    negative_samples,
    unigram_cdf,
)

VOCAB = {"apple": 40, "banana": 10, "cherry": 90, "date": 1}


def _py_cdf(power=0.75):
    words = sorted(VOCAB)
    micro = [_power_micro(VOCAB[w], power) for w in words]
    hi, acc = [], 0
    for m in micro:
        acc += m
        hi.append(acc)
    return words, hi, acc


def _py_draw(a, b, j, salt="neg"):
    words, hi, total = _py_cdf()
    u = hash60_py(f"{a}:{b}:{j}:{salt}") % total
    return words[bisect.bisect_right(hi, u)]


def test_power_micro_exact_chain():
    assert _power_micro(16, 0.75) == int(
        math.floor(math.sqrt(16.0) * math.sqrt(4.0) * (1 << 20) + 0.5)
    ) == 8 * (1 << 20)
    assert _power_micro(9, 0.5) == 3 * (1 << 20)
    assert _power_micro(7, 1.0) == 7 * (1 << 20)


def test_cdf_pick_interval_semantics():
    import numpy as np

    cdf = UnigramCDF(["a", "b"], [100, 50])
    assert cdf.total == 150
    got = cdf.pick(np.array([0, 99, 100, 149]))
    assert list(got) == ["a", "a", "b", "b"]


def test_cdf_guards():
    with pytest.raises(ValueError):
        UnigramCDF([], [])
    with pytest.raises(ValueError):
        UnigramCDF(["a"], [0])
    with pytest.raises(ValueError):
        UnigramCDF(["a", "b"], [1 << 62, 5])


def test_negative_samples_match_python_model(spark):
    counts = spark.createDataFrame(
        [Row(token=w, n=n) for w, n in VOCAB.items()]
    )
    cdf = unigram_cdf(counts)
    pairs = spark.createDataFrame(
        [Row(lhs="apple", rhs="cherry"), Row(lhs="banana", rhs="date")]
    )
    out = negative_samples(pairs, cdf, k=3).collect()
    assert len(out) == 6
    for r in out:
        assert r["negative"] == _py_draw(r["lhs"], r["rhs"], r["j"])
        assert r["negative"] in VOCAB


def test_negative_samples_partitioning_invariant(spark):
    counts = spark.createDataFrame(
        [Row(token=w, n=n) for w, n in VOCAB.items()]
    )
    pairs = spark.createDataFrame(
        [Row(lhs=f"w{i}", rhs=f"w{i+1}") for i in range(30)]
    )
    cdf = unigram_cdf(counts.repartition(3))
    a = sorted(
        (r["lhs"], r["j"], r["negative"])
        for r in negative_samples(pairs, cdf, k=2).collect()
    )
    b = sorted(
        (r["lhs"], r["j"], r["negative"])
        for r in negative_samples(pairs.repartition(7), cdf, k=2).collect()
    )
    assert a == b


def test_frequent_words_drawn_more(spark):
    counts = spark.createDataFrame(
        [Row(token=w, n=n) for w, n in VOCAB.items()]
    )
    cdf = unigram_cdf(counts)
    pairs = spark.createDataFrame(
        [Row(lhs=f"a{i}", rhs=f"b{i}") for i in range(200)]
    )
    out = negative_samples(pairs, cdf, k=1).groupBy("negative").count()
    got = {r["negative"]: r["count"] for r in out.collect()}
    # cherry (90) must dominate date (1): 90^.75 / 1^.75 = ~29x mass
    assert got.get("cherry", 0) > got.get("date", 0)
    assert got.get("cherry", 0) > got.get("banana", 0)


def test_sampling_adds_no_exchange(spark):
    counts = spark.createDataFrame(
        [Row(token=w, n=n) for w, n in VOCAB.items()]
    )
    cdf = unigram_cdf(counts)
    pairs = spark.createDataFrame(
        [Row(lhs="apple", rhs="cherry")]
    )
    plan = (
        negative_samples(pairs, cdf, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # explode(sequence) + hash-mod + ArrowEvalPython are all row-local:
    # the draw stage must not introduce any Exchange of its own
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan
