"""Token-blocking ER candidate generation (operators/blocking.py):
hand-checkable blocks/scores, block purging bounds, rarity weighting,
and the same_as edge hand-off to connected components."""

from __future__ import annotations

import math

from pyspark.sql import Row

from kg_microbe_merge_spark.operators.blocking import (
    same_as_edges,
    token_blocking_candidates,
)


def _ents(spark, rows):
    return spark.createDataFrame([Row(id=i, name=n) for i, n in rows])


def test_candidates_hand_checkable(spark):
    ents = _ents(
        spark,
        [
            (1, "acetobacter pasteurianus strain"),
            (2, "acetobacter aceti strain"),
            (3, "pasteurianus culture"),
            (4, "unrelated thing"),
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): (r["shared"], r["score"])
        for r in token_blocking_candidates(ents, max_block=10).collect()
    }
    # blocks: acetobacter{1,2}, pasteurianus{1,3}, strain{1,2};
    # singletons (aceti, culture, unrelated, thing) pair nothing
    assert set(got) == {(1, 2), (1, 3)}
    n = 4
    idf = lambda df: math.floor(math.log(n / df) * 1e6 + 0.5)
    assert got[(1, 2)][0] == 2  # acetobacter + strain
    assert got[(1, 2)][1] == (idf(2) + idf(2)) / 1e6
    assert got[(1, 3)][0] == 1
    assert got[(1, 3)][1] == idf(2) / 1e6


def test_block_purge_caps_quadratic_term(spark):
    # "strain" appears in all 30 entities → purged at max_block=10;
    # only the two rare-token entities pair
    rows = [(i, f"strain organism{i}") for i in range(28)]
    rows += [(100, "strain rareword"), (101, "rareword culture")]
    ents = _ents(spark, rows)
    got = token_blocking_candidates(ents, max_block=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(100, 101)}


def test_rarer_tokens_score_higher(spark):
    # pair A shares a rare token (df=2 of 20), pair B shares a common
    # one (df=10) — A must outscore B
    rows = [(i, f"common{i % 2} filler{i}") for i in range(16)]
    rows += [(50, "common0 rare"), (51, "rare other"),
             (60, "common1 x9"), (61, "common1 y9")]
    ents = _ents(spark, rows)
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in token_blocking_candidates(ents, max_block=12).collect()
    }
    assert got[(50, 51)] > got[(60, 61)]


def test_same_as_edges_feed_components(spark):
    ents = _ents(
        spark,
        [
            (1, "alpha beta"),
            (2, "alpha beta"),
            (3, "gamma delta"),
            (4, "gamma delta"),
            (5, "lone name"),
        ],
    )
    cand = token_blocking_candidates(ents, max_block=10)
    edges = same_as_edges(cand, min_score=0.5)
    from kg_microbe_merge_spark.operators.components import (
        connected_components,
    )

    comp = {
        r["node"]: r["component"]
        for r in connected_components(
            edges.select(
                edges["subject"].cast("string").alias("subject"),
                edges["object"].cast("string").alias("object"),
            ),
            src="subject",
            dst="object",
        ).collect()
    }
    assert comp["1"] == comp["2"]
    assert comp["3"] == comp["4"]
    assert comp["1"] != comp["3"]
