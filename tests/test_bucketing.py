"""Bucketed-join plan verification: two tables bucketed on the join key
sort-merge-join with NO shuffle Exchange on either side."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_microbe_merge_spark.plans.materialize import read_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    nodes = spark.range(2000).select(
        F.concat(F.lit("N:"), F.col("id")).alias("id"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )
    edges = spark.range(6000).select(
        F.concat(F.lit("N:"), (F.col("id") % 2000)).alias("id"),
        F.concat(F.lit("T:"), F.col("id")).alias("target"),
    )
    write_bucketed(nodes, "b_nodes", ["id"], num_buckets=8)
    write_bucketed(edges, "b_edges", ["id"], num_buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "b_edges").join(
            read_table(spark, "b_nodes"), "id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        # correctness too
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_nodes")
        spark.sql("DROP TABLE IF EXISTS b_edges")


def test_bucketed_aggregation_no_exchange(spark, tmp_path):
    edges = spark.range(5000).select(
        F.concat(F.lit("N:"), (F.col("id") % 500)).alias("id"),
        F.col("id").alias("payload"),
    )
    write_bucketed(edges, "b_agg", ["id"], num_buckets=8)
    try:
        agg = read_table(spark, "b_agg").groupBy("id").agg(F.count("*").alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # agg key == bucket key
        assert agg.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS b_agg")
