"""Plan-shape assertions for the round-3 vector/LM/fingerprint/diff
operators — pinning the scale claims in PLANS.md the way the elder
operators pin theirs (shuffle counts, no cartesian products, row-local
production stages)."""

from __future__ import annotations

from pyspark.sql import Row

from kg_microbe_merge_spark.operators.diff import snapshot_diff
from kg_microbe_merge_spark.operators.ngram_lm import bigram_instances
from kg_microbe_merge_spark.operators.winnow import winnow_fingerprints


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma delta w{i} x{i} y{i}")
         for i in range(20)]
    )


def test_bigram_production_is_row_local(spark):
    # the bigram instance stream (the corpus-sized relation every LM
    # count hangs off) must be produced inside the scan stage: slices +
    # arrays_zip + explode, NO Exchange anywhere in its plan
    plan = _plan(bigram_instances(_docs(spark)))
    assert "Exchange" not in plan, plan


def test_winnow_fingerprints_single_exchange(spark):
    # gram hashing + window-min selection row-local; the ONLY Exchange
    # is the final distinct on (doc_id, fp)
    plan = _plan(winnow_fingerprints(_docs(spark), k=3, w=4))
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(doc_id" in plan, plan
    assert "CartesianProduct" not in plan
    # the staged-projection barrier must survive optimization: the
    # token array and the gram array each materialize in their OWN
    # Project (inlining the gram subtree into every window lambda is
    # the O(n²)-md5 regression this pins — 671 s vs 6.7 s at sf0.1)
    assert "_toks#" in plan, plan
    assert "_g#" in plan, plan


def test_snapshot_diff_two_exchanges_no_cartesian(spark):
    old = spark.createDataFrame(
        [Row(id=i, name=f"n{i}", price=float(i)) for i in range(50)]
    )
    new = spark.createDataFrame(
        [Row(id=i + 1, name=f"n{i + 1}", price=float(i)) for i in range(50)]
    )
    d = snapshot_diff(old, new)
    plan = _plan(d)
    # full outer join: one Exchange per side, nothing else; the column
    # compare is a row-local Project above the join
    assert plan.count("Exchange") <= 2, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "FullOuter" in plan.replace(" ", ""), plan


def test_temperature_mix_is_shuffle_free(spark):
    from kg_microbe_merge_spark.operators.mixing import temperature_mix

    df = spark.createDataFrame(
        [Row(doc_id=i, source="a" if i % 3 else "b") for i in range(60)]
    )
    out = temperature_mix(df, 0.5, target_total=30)
    plan = _plan(out)
    # bounds are literal CASE branches: ONE filter folded into the scan
    # stage, no join, no Exchange — the 100 TB mixing pass is scan-speed
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_cap_per_source_partial_group_limit_before_exchange(spark):
    from kg_microbe_merge_spark.operators.mixing import cap_per_source

    df = spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i % 2}") for i in range(400)]
    )
    out = cap_per_source(df, cap=5, source_col="source")
    plan = _plan(out)
    # hash prefilter sits in the scan stage; exactly ONE Exchange (the
    # per-source window), and Spark's WindowGroupLimit runs in Partial
    # mode BEFORE it — at most cap rows per source per map partition
    # ever cross the wire, so a 90%-of-corpus source costs what a tiny
    # one does
    assert plan.count("Exchange") == 1, plan
    assert "WindowGroupLimit" in plan, plan
    partial = plan.find("Partial")
    exchange = plan.find("Exchange")
    assert partial != -1 and exchange < partial, plan
