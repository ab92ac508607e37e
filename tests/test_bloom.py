"""Bloom-filter join pruning (operators/bloom.py): python-twin bitmap
equality, no-false-negative guarantee, bounded false-positive rate,
bitmap mergeability, pruned-semi-join exactness, NULL handling, and
the plan shapes the 100 TB story depends on (fixed-size build
exchange, zero probe-side exchange, no Python)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.bloom import (
    bloom_bitmap,
    bloom_literal,
    bloom_merge,
    bloom_prune_semi_join,
    bloom_py,
    with_might_contain,
)

NB, K = 1 << 12, 5


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _build(spark, keys):
    return spark.createDataFrame([Row(key=x) for x in keys])


def test_bitmap_matches_python_twin(spark):
    keys = [f"k-{i}" for i in range(0, 500, 2)]
    words = bloom_literal(bloom_bitmap(_build(spark, keys), "key", NB, K), NB)
    py_words, _ = bloom_py(keys, NB, K)
    assert words == py_words


def test_no_false_negatives_and_bounded_fp(spark):
    present = [f"k-{i}" for i in range(0, 500, 2)]
    absent = [f"k-{i}" for i in range(1, 500, 2)]
    words = bloom_literal(
        bloom_bitmap(_build(spark, present), "key", NB, K), NB
    )
    probe = spark.createDataFrame(
        [Row(pk=x) for x in present + absent] + [Row(pk=None)]
    )
    got = {
        r.pk: r.might_contain
        for r in with_might_contain(probe, "pk", words, K).collect()
    }
    assert all(got[x] for x in present)  # NEVER misses a member
    assert got[None] is False
    # 250 keys in 4096 bits, k=5: expected fp ~ (1-e^(-5*250/4096))^5
    # ~ 0.2% — allow 5% before calling it a bug
    fp = sum(1 for x in absent if got[x])
    assert fp / len(absent) < 0.05, fp


def test_bitmap_merge_equals_union(spark):
    xs = [f"a-{i}" for i in range(200)]
    ys = [f"b-{i}" for i in range(200)]
    merged = bloom_literal(
        bloom_merge(
            bloom_bitmap(_build(spark, xs), "key", NB, K),
            bloom_bitmap(_build(spark, ys), "key", NB, K),
        ),
        NB,
    )
    whole = bloom_literal(
        bloom_bitmap(_build(spark, xs + ys), "key", NB, K), NB
    )
    assert merged == whole


def test_prune_semi_join_exact(spark):
    small = _build(spark, [f"k-{i}" for i in range(0, 300, 3)])
    big = spark.createDataFrame(
        [Row(pk=f"k-{i}", v=i) for i in range(300)] + [Row(pk=None, v=-1)]
    )
    got = {
        (r.pk, r.v)
        for r in bloom_prune_semi_join(
            big, small, "pk", "key", NB, K
        ).collect()
    }
    exp = {
        (r.pk, r.v)
        for r in big.join(
            small.withColumnRenamed("key", "pk").distinct(),
            "pk",
            "left_semi",
        ).collect()
    }
    assert got == exp
    assert len(got) == 100


def test_plan_shapes(spark):
    small = _build(spark, [f"k-{i}" for i in range(50)])
    big = spark.createDataFrame([Row(pk=f"k-{i}", v=i) for i in range(200)])
    # build: probe explode row-local, ONE fixed-size partial-agg shuffle
    bplan = _plan(bloom_bitmap(small, "key", NB, K))
    assert bplan.count("Exchange hashpartitioning") == 1, bplan
    assert "partial_bit_or" in bplan or "partial" in bplan.lower(), bplan
    # probe: the membership test adds NO exchange and NO Python — pure
    # row-local codegen against the inlined literal
    words = bloom_literal(bloom_bitmap(small, "key", NB, K), NB)
    pplan = _plan(with_might_contain(big, "pk", words, K))
    assert "Exchange" not in pplan, pplan
    assert "BatchEvalPython" not in pplan and "ArrowEvalPython" not in pplan
