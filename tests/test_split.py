"""Deterministic holdout split / sampling: reproducibility, stability
under data growth, approximate proportions, and the repetition-ratio
text metric.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.split import (
    deterministic_sample,
    holdout_split,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )


def test_holdout_split_proportions_and_determinism(spark):
    d = _docs(spark)
    s1 = holdout_split(d).groupBy("split").count().collect()
    frac = {r["split"]: r["count"] / 2000 for r in s1}
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["valid"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03
    # identical assignment on a second run
    a = {r["doc_id"]: r["split"] for r in holdout_split(d).collect()}
    b = {r["doc_id"]: r["split"] for r in holdout_split(d).collect()}
    assert a == b


def test_holdout_split_stable_under_growth(spark):
    """A row's split must not change when the table grows — the property
    RNG-based splits lack."""
    small = {r["doc_id"]: r["split"] for r in holdout_split(_docs(spark, 500)).collect()}
    big = {r["doc_id"]: r["split"] for r in holdout_split(_docs(spark, 2000)).collect()}
    for k, v in small.items():
        assert big[k] == v


def test_deterministic_sample_is_subset_and_stable(spark):
    d = _docs(spark)
    kept = {r["doc_id"] for r in deterministic_sample(d, 0.3).collect()}
    assert abs(len(kept) / 2000 - 0.3) < 0.05
    again = {r["doc_id"] for r in deterministic_sample(d, 0.3).collect()}
    assert kept == again
    # nested fractions: a 10% sample is a subset of the 30% sample
    small = {r["doc_id"] for r in deterministic_sample(d, 0.1).collect()}
    assert small <= kept


def test_repetition_ratio_values(spark):
    from kg_microbe_merge_spark.functions.text import repetition_ratio

    d = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # 4/4
            (2, "a b c d"),                       # 1/4
            (3, "nav nav home about contact"),    # 2/5
            (4, ""),                              # empty -> 0.0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["r"] for r in d.select(
        "doc_id", repetition_ratio(F.col("text")).alias("r")).collect()}
    assert out[1] == 1.0
    assert out[2] == 0.25
    assert out[3] == 0.4
    assert out[4] == 0.0


def test_stratified_sample_fractions_and_stability(spark):
    from kg_microbe_merge_spark.operators.split import stratified_sample

    d = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zz")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    s = stratified_sample(d, {"en": 0.8, "de": 0.2}, strata_col="lang",
                          default_fraction=0.0)
    counts = {r["lang"]: r["n"] for r in
              s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / 1000 - 0.8) < 0.06
    assert abs(counts["de"] / 1000 - 0.2) < 0.06
    assert "zz" not in counts           # default fraction 0 drops stratum
    # kept set is the per-stratum slice of the flat deterministic sample
    from kg_microbe_merge_spark.operators.split import deterministic_sample

    flat = {r["doc_id"] for r in deterministic_sample(d, 0.2).collect()}
    de_kept = {r["doc_id"] for r in s.filter("lang = 'de'").collect()}
    assert de_kept == {i for i in flat if i % 3 == 1}


def test_weighted_sample_matches_python_twin(spark):
    import math

    from kg_microbe_merge_spark.functions.hashing import hash60_py
    from kg_microbe_merge_spark.operators.split import weighted_sample

    d = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).cast("long").alias("w"),
    )
    got = [
        (r["doc_id"], r["w"], r["key_micro"])
        for r in weighted_sample(d, k=20, weight_col="w").collect()
    ]

    def key(i, w):
        h = hash60_py(f"{i}:wsample")
        return math.log((h + 1) / float(1 << 60)) / w

    rows = sorted(
        ((i, i % 7 + 1) for i in range(200)),
        key=lambda t: (-key(*t), t[0]),
    )[:20]
    want = [
        (i, w, math.floor(key(i, w) * 1e6 + 0.5)) for i, w in rows
    ]
    assert got == want


def test_weighted_sample_weight_proportionality(spark):
    """Across salts, a weight-10 item should be sampled ~10x as often
    as a weight-1 item (A-ES inclusion ∝ weight for k << N)."""
    from kg_microbe_merge_spark.operators.split import weighted_sample

    d = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 50, F.lit(10)).otherwise(F.lit(1))
        .cast("long").alias("w"),
    )
    heavy = light = 0
    for s in range(30):
        ids = {
            r["doc_id"]
            for r in weighted_sample(
                d, k=25, weight_col="w", salt=f"s{s}"
            ).collect()
        }
        heavy += sum(1 for i in ids if i < 50)
        light += sum(1 for i in ids if i >= 50)
    # 50 heavy (w=10) vs 450 light (w=1): weight mass 500 vs 450, so
    # roughly half the draws should be heavy; require a wide band
    frac = heavy / (heavy + light)
    assert 0.35 < frac < 0.65, (heavy, light)


def test_weighted_sample_guards(spark):
    import pytest as _pytest

    from kg_microbe_merge_spark.operators.split import weighted_sample

    # null weights and w <= 0 rows must never displace weighted rows
    d = spark.createDataFrame(
        [(1, None), (2, 0), (3, -2), (4, 5), (5, 3)],
        "doc_id int, w int",
    )
    got = {r["doc_id"] for r in
           weighted_sample(d, k=10, weight_col="w").collect()}
    assert got == {4, 5}
    with _pytest.raises(ValueError):
        weighted_sample(d, k=0, weight_col="w")


def test_weighted_sample_partitioning_invariance(spark):
    from kg_microbe_merge_spark.operators.split import weighted_sample

    d = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5 + 1).cast("long").alias("w"),
    )
    a = weighted_sample(d.repartition(17), k=30, weight_col="w").collect()
    b = weighted_sample(d.coalesce(1), k=30, weight_col="w").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
