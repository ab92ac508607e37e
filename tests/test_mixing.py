"""Corpus mixing (operators/mixing.py): temperature re-weighting and
skew-safe per-source caps — python-model equivalence, determinism,
growth stability, exactness of the prefilter+window cap, and the
prefix-sufficiency verification."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.hashing import HASH60_SPACE, hash60_py
from kg_microbe_merge_spark.operators.mixing import (
    CapPrefilterInsufficient,
    cap_per_source,
    cap_thresholds,
    source_counts,
    temperature_bounds,
    temperature_mix,
)

_BUCKETS = 10_000


def _corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "source"])


def _mix_bucket(doc_id: int, salt: str) -> int:
    return hash60_py(f"{doc_id}:{salt}") % _BUCKETS


def test_temperature_bounds_python_model():
    counts = {"web": 350, "books": 100, "code": 25, "wiki": 25}
    bounds = temperature_bounds(counts, 0.5, 250)
    micro = {s: int(math.floor(math.sqrt(n) * (1 << 20) + 0.5)) for s, n in counts.items()}
    tw = sum(micro.values())
    for s, n in counts.items():
        raw = math.floor(10000.0 * 250 * micro[s] / tw / n + 0.5)
        assert bounds[s] == max(0, min(10000, int(raw)))
    # temperature < 1 flattens: small sources keep a larger fraction
    assert bounds["code"] > bounds["web"]
    # tiny sources clamp at keep-everything
    assert bounds["code"] == bounds["wiki"] == 10000


def test_temperature_one_is_uniform_rate():
    counts = {"a": 1000, "b": 10}
    bounds = temperature_bounds(counts, 1.0, 505)
    # tau=1 keeps the raw shares: every source gets the same rate
    assert bounds["a"] == bounds["b"] == 5000


def test_temperature_mix_matches_hash_model(spark):
    sizes = {"web": 200, "books": 60, "code": 15}
    df = _corpus(spark, sizes)
    kept = temperature_mix(df, 0.5, target_total=100).collect()
    bounds = temperature_bounds(sizes, 0.5, 100)
    expected = set()
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            if _mix_bucket(i, "mix") < bounds[s]:
                expected.add(i)
            i += 1
    assert {r["doc_id"] for r in kept} == expected


def test_temperature_mix_growth_stable(spark):
    # membership is a pure per-row function given fixed bounds: adding
    # rows with the same counts dict never flips existing rows
    sizes = {"web": 120, "code": 20}
    small = _corpus(spark, sizes)
    counts = source_counts(small)
    extra = spark.createDataFrame(
        [(1000 + i, "web") for i in range(100)], ["doc_id", "source"]
    )
    big = small.unionByName(extra)
    kept_small = {
        r["doc_id"]
        for r in temperature_mix(small, 0.5, 60, counts=counts).collect()
    }
    kept_big_fixed = {
        r["doc_id"]
        for r in temperature_mix(big, 0.5, 60, counts=counts)
        .filter(F.col("doc_id") < 1000)
        .collect()
    }
    assert kept_small == kept_big_fixed


def test_cap_thresholds_small_source_keeps_all():
    thr = cap_thresholds({"big": 1000, "tiny": 10}, cap=8, oversample=4)
    assert thr["tiny"] == HASH60_SPACE
    assert thr["big"] == int(math.floor(float(HASH60_SPACE) * 32.0 / 1000))


def test_cap_per_source_exact_top_cap(spark):
    sizes = {"web": 300, "books": 80, "tiny": 5}
    df = _corpus(spark, sizes)
    out = cap_per_source(df, cap=8, oversample=4).collect()
    got = {}
    for r in out:
        got.setdefault(r["source"], []).append(
            (r["rank_in_source"], r["doc_id"])
        )
    # python ground truth: cap smallest seeded hashes per source,
    # computed WITHOUT any prefilter
    i, by_source = 0, {}
    for s, n in sizes.items():
        for _ in range(n):
            by_source.setdefault(s, []).append(
                (hash60_py(f"{i}:cap"), i)
            )
            i += 1
    for s, n in sizes.items():
        want = sorted(by_source[s])[: min(8, n)]
        have = sorted(got[s])
        assert [d for _, d in want] == [d for _, d in have], s
        assert [r for r, _ in have] == list(range(1, len(want) + 1))


def test_cap_per_source_deterministic(spark):
    df = _corpus(spark, {"web": 150, "books": 40})
    a = sorted(r["doc_id"] for r in cap_per_source(df, cap=6).collect())
    b = sorted(
        r["doc_id"]
        for r in cap_per_source(df.repartition(7), cap=6).collect()
    )
    assert a == b and len(a) == 12


def test_cap_verify_raises_on_insufficient_prefilter(spark):
    # lie about the source size: thresholds sized for n=100000 keep
    # ~0.03% of 200 real rows -> fewer than cap survive -> must raise,
    # never silently return an under-capped "exact" result
    df = _corpus(spark, {"web": 200})
    with pytest.raises(CapPrefilterInsufficient):
        cap_per_source(
            df, cap=8, counts={"web": 100_000}, oversample=4
        )


def test_cap_verify_off_returns_partial(spark):
    df = _corpus(spark, {"web": 200})
    out = cap_per_source(
        df, cap=8, counts={"web": 100_000}, oversample=4, verify=False
    ).collect()
    assert len(out) < 8
