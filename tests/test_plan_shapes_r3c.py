"""Plan-shape assertions for the round-3c operators (BPE training,
meta-blocking, crawl frontier) — pinning their PLANS.md scale claims:
pair counts partially aggregate map-side, politeness caps run as
map-side WindowGroupLimit Partials, canonicalization never shuffles."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.bpe import (
    _pair_counts,
    _wrapped_state,
    word_table,
)
from kg_microbe_merge_spark.operators.frontier import (
    canonical_url,
    fetch_schedule,
)
from kg_microbe_merge_spark.operators.metablocking import meta_blocking


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"low lower lowest new {i % 3}") for i in range(20)]
    )


def test_bpe_pair_count_partial_agg_single_exchange(spark):
    state = _wrapped_state(word_table(_docs(spark), "text"))
    plan = _plan(_pair_counts(state))
    # the wordcount exchange feeds the state; the pair count adds ONE
    # more — and both aggregations must combine map-side
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_count" in plan or "Partial" in plan, plan


def test_frontier_canonicalization_zero_exchange(spark):
    urls = spark.createDataFrame(
        [Row(url=f"HTTP://H{i}.com:80/a/?utm=1&b={i}#f") for i in range(10)]
    )
    plan = _plan(urls.select(canonical_url(F.col("url")).alias("c")))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

def test_crawl_schedule_cap_runs_as_partial_group_limit(spark):
    urls = spark.createDataFrame(
        [Row(canonical_url=f"https://h{i % 3}.com/p{i}") for i in range(30)]
    )
    sched = fetch_schedule(urls, max_per_host=2)
    plan = _plan(sched)
    # the per-host budget must bound rows BEFORE the host exchange:
    # Spark plans the rank filter as WindowGroupLimit with a Partial
    # mode instance below the shuffle
    assert "WindowGroupLimit" in plan, plan
    head = plan.split("Exchange hashpartitioning", 1)[1]
    assert "WindowGroupLimit" in head, plan


def test_meta_blocking_cnp_group_limit_and_no_cartesian(spark):
    ents = spark.createDataFrame(
        [Row(id=i, name=f"acme widget {'east' if i % 2 else 'west'} {i % 5}")
         for i in range(30)]
    )
    df = meta_blocking(ents, top_k=2)
    df.collect()
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    # CNP top-k is a WindowGroupLimit rank filter
    assert "WindowGroupLimit" in plan, plan
    # WEP stats enter via a broadcast, never a shuffled join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
