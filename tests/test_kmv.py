"""KMV bottom-k sketches + set-intersection (operators/kmv.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.kmv import (
    HASH_SPACE,
    kmv_estimate,
    kmv_estimate_py,
    kmv_intersection,
    kmv_merge,
    kmv_py,
    kmv_sketch,
)


def _items_df(spark, items, group=None):
    if group is None:
        return spark.createDataFrame([Row(item=str(x)) for x in items])
    return spark.createDataFrame(
        [Row(g=g, item=str(x)) for g, x in items]
    )


def test_sketch_matches_python_twin(spark):
    items = [f"tok{i}" for i in range(500)] + ["tok1", "tok2"]  # dups
    got = kmv_sketch(_items_df(spark, items), "item", k=64).collect()
    assert len(got) == 1
    assert list(got[0]["hs"]) == kmv_py(items, k=64)


def test_grouped_sketch_matches_python_twin(spark):
    pairs = [("a", f"x{i}") for i in range(300)] + [
        ("b", f"y{i}") for i in range(40)
    ]
    got = {
        r["g"]: list(r["hs"])
        for r in kmv_sketch(
            _items_df(spark, pairs, group=True), "item", ["g"], k=32
        ).collect()
    }
    assert got["a"] == kmv_py([f"x{i}" for i in range(300)], k=32)
    assert got["b"] == kmv_py([f"y{i}" for i in range(40)], k=32)


def test_unsaturated_sketch_estimate_is_exact(spark):
    items = [f"v{i}" for i in range(20)] * 3  # 20 distinct, many dups
    est = kmv_estimate(
        kmv_sketch(_items_df(spark, items), "item", k=256), k=256
    ).collect()[0]
    assert est["n_sample"] == 20
    assert est["est_micro"] == 20_000_000
    assert est["est"] == 20.0


def test_estimate_accuracy_5_sigma(spark):
    n, k = 20000, 256
    items = [f"item-{i}" for i in range(n)]
    est = kmv_estimate(
        kmv_sketch(_items_df(spark, items), "item", k=k), k=k
    ).collect()[0]["est"]
    sigma = n / (k - 2) ** 0.5
    assert abs(est - n) < 5 * sigma, (est, n, sigma)
    assert est == kmv_estimate_py(kmv_py(items, k=k), k=k)


def test_merge_equals_union_sketch(spark):
    a_items = [f"a{i}" for i in range(400)]
    b_items = [f"b{i}" for i in range(300)] + a_items[:100]
    k = 64
    a = kmv_sketch(_items_df(spark, a_items), "item", k=k)
    b = kmv_sketch(_items_df(spark, b_items), "item", k=k)
    merged = kmv_merge(a, b, k=k).collect()[0]["hs"]
    direct = kmv_py(a_items + b_items, k=k)
    assert list(merged) == direct
    # idempotent: re-merging the same sketch is a no-op (replay-safe)
    again = kmv_merge(kmv_merge(a, b, k=k), b, k=k).collect()[0]["hs"]
    assert list(again) == direct


def test_small_set_intersection_is_exact(spark):
    # both sketches unsaturated -> the union sample IS the union, so
    # matches/union = exact Jaccard and inter_est = exact |A ∩ B|
    a_items = [f"c{i}" for i in range(30)]
    b_items = [f"c{i}" for i in range(20, 50)]  # overlap = 10
    k = 256
    a = kmv_sketch(_items_df(spark, a_items), "item", k=k)
    b = kmv_sketch(_items_df(spark, b_items), "item", k=k)
    row = kmv_intersection(a, b, k=k).collect()[0]
    assert row["n_a"] == 30 and row["n_b"] == 30
    assert row["n_union_sample"] == 50
    assert row["matches"] == 10
    assert row["inter_est_micro"] == 10_000_000
    assert row["jaccard_micro"] == 200_000  # 10/50


def test_intersection_accuracy_on_large_overlap(spark):
    # |A| = |B| = 8000, overlap 4000 -> Jaccard = 1/3. The sampled
    # Jaccard is a hypergeometric mean with sd ~ sqrt(J(1-J)/k).
    k = 256
    a_items = [f"s{i}" for i in range(8000)]
    b_items = [f"s{i}" for i in range(4000, 12000)]
    a = kmv_sketch(_items_df(spark, a_items), "item", k=k)
    b = kmv_sketch(_items_df(spark, b_items), "item", k=k)
    row = kmv_intersection(a, b, k=k).collect()[0]
    j = row["jaccard_micro"] / 1e6
    sd = (1 / 3 * 2 / 3 / k) ** 0.5
    assert abs(j - 1 / 3) < 5 * sd, (j, sd)
    inter = row["inter_est_micro"] / 1e6
    assert abs(inter - 4000) < 4000 * 0.5, inter


def test_disjoint_sets_zero_intersection(spark):
    a = kmv_sketch(_items_df(spark, [f"p{i}" for i in range(1000)]), "item")
    b = kmv_sketch(_items_df(spark, [f"q{i}" for i in range(1000)]), "item")
    row = kmv_intersection(a, b).collect()[0]
    assert row["matches"] == 0
    assert row["inter_est_micro"] == 0 and row["jaccard_micro"] == 0


def test_sketch_build_partial_group_limit_before_exchange(spark):
    """The sketch build is the cap_per_source shape: WindowGroupLimit
    runs a Partial pass BELOW the single required exchange, so at most
    the k smallest distinct hashes per group leave each map partition
    regardless of item cardinality."""
    df = spark.createDataFrame(
        [Row(g=f"g{i % 4}", item=f"i{i}") for i in range(4000)]
    )
    out = kmv_sketch(df, "item", ["g"], k=16)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in plan, plan
    partial = plan.find("Partial")
    exchange = plan.find("Exchange")
    assert partial != -1 and exchange != -1 and exchange < partial, plan


def test_join_size_exact_when_unsaturated(spark):
    """Both key universes below k: the union sample IS the union, the
    union estimate is exact, so the join-size estimate is EXACTLY
    sum(f_a(key) * f_b(key)) — the true join output size."""
    from kg_microbe_merge_spark.operators.kmv import (
        kmv_freq_sketch,
        kmv_join_size,
    )

    a_rows = [Row(key=f"k{i % 10}") for i in range(50)]   # 10 keys x 5
    b_rows = [Row(key=f"k{i % 20}") for i in range(40)]   # 20 keys x 2
    a = kmv_freq_sketch(spark.createDataFrame(a_rows), "key")
    b = kmv_freq_sketch(spark.createDataFrame(b_rows), "key")
    row = kmv_join_size(a, b).collect()[0]
    # true join size: keys k0..k9 match, 5 * 2 each = 100
    assert row["matches"] == 10
    assert row["sum_products"] == 100
    assert row["join_size_est_micro"] == 100_000_000
    assert row["n_union_sample"] == 20


def test_join_size_accuracy_on_large_join(spark):
    from kg_microbe_merge_spark.operators.kmv import (
        kmv_freq_sketch,
        kmv_join_size,
    )

    # 5000 shared keys, f_a = 1..3 cyclic, f_b = 1..2 cyclic;
    # true size = sum over keys of f_a*f_b
    a_rows = [
        Row(key=f"s{i}") for i in range(5000) for _ in range(i % 3 + 1)
    ]
    b_rows = [
        Row(key=f"s{i}") for i in range(5000) for _ in range(i % 2 + 1)
    ]
    true = sum((i % 3 + 1) * (i % 2 + 1) for i in range(5000))
    a = kmv_freq_sketch(spark.createDataFrame(a_rows), "key")
    b = kmv_freq_sketch(spark.createDataFrame(b_rows), "key")
    est = kmv_join_size(a, b).collect()[0]["join_size_est_micro"] / 1e6
    # union rel error ~1/sqrt(k-2) plus product-sampling noise; require
    # a wide-but-meaningful band
    assert abs(est - true) < 0.5 * true, (est, true)


def test_join_size_disjoint_keys_is_zero(spark):
    from kg_microbe_merge_spark.operators.kmv import (
        kmv_freq_sketch,
        kmv_join_size,
    )

    a = kmv_freq_sketch(
        spark.createDataFrame([Row(key=f"a{i}") for i in range(500)]), "key"
    )
    b = kmv_freq_sketch(
        spark.createDataFrame([Row(key=f"b{i}") for i in range(500)]), "key"
    )
    row = kmv_join_size(a, b).collect()[0]
    assert row["matches"] == 0
    assert row["sum_products"] == 0
    assert row["join_size_est_micro"] == 0
