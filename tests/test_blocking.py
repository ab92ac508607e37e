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


def test_sorted_neighborhood_matches_brute_and_duckdb(spark):
    import duckdb
    from kg_microbe_merge_spark.operators.blocking import (
        sorted_neighborhood_pairs,
        sorted_neighborhood_sql,
    )

    ents = [
        (1, "acme widgets"),
        (2, "acme widget"),      # adjacent after sort (truncation typo)
        (3, "acme widgetz"),
        (4, "globex corp"),
        (5, "globex corporation"),
        (6, "zzz unrelated"),
        (7, None),               # NULL name -> '' key, sorts first
        (8, "Acme  Widget "),    # normalizes onto #2's key
    ]
    df = spark.createDataFrame(ents, "id long, name string")
    got = sorted(
        (r["id_a"], r["id_b"], r["gap"])
        for r in sorted_neighborhood_pairs(df, window=3).collect()
    )
    # brute force: sort by (normalized key, id), pair gaps 1..2
    import re
    recs = sorted(
        (re.sub(r"\s+", " ", (n or "").lower()).strip(), str(i))
        for i, n in ents
    )
    brute = sorted(
        (recs[i][1], recs[j][1], j - i)
        for i in range(len(recs))
        for j in range(i + 1, min(i + 3, len(recs)))
    )
    assert got == brute
    con = duckdb.connect()
    con.execute("CREATE TABLE ent(id BIGINT, name VARCHAR)")
    con.executemany("INSERT INTO ent VALUES (?, ?)", ents)
    oracle = sorted(
        tuple(r)
        for r in con.execute(
            sorted_neighborhood_sql("SELECT id, name FROM ent", window=3)
        ).fetchall()
    )
    assert got == oracle
    # the truncation pair token-blocking misses (no shared rare token
    # of the same spelling) is caught by sort adjacency
    assert any(
        {a, b} == {"1", "2"} or {a, b} == {"2", "8"}
        for a, b, _g in got
    )


def test_sorted_neighborhood_window_validation(spark):
    import pytest as _pytest
    from kg_microbe_merge_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with _pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, window=1)


def test_sorted_neighborhood_partitioning_invariance(spark):
    from kg_microbe_merge_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    rows = [(i, f"name {i % 13} variant {i % 7}") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, name string")
    a = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(df.repartition(11), window=5).collect()
    )
    b = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(df.coalesce(1), window=5).collect()
    )
    assert a == b


def test_blocking_metrics(spark):
    """Pair completeness / pairs quality / reduction ratio
    (operators/blocking.blocking_metrics): hand values, direction
    canonicalization, integer micro rounding, guard, DuckDB twin."""
    import duckdb

    from kg_microbe_merge_spark.operators.blocking import blocking_metrics

    cand = [("r1", "r2"), ("r3", "r1"), ("r2", "r1"), ("r4", "r5")]
    truth = [("r2", "r1"), ("r5", "r4"), ("r1", "r6")]
    c = spark.createDataFrame(cand, "a string, b string")
    t = spark.createDataFrame(truth, "a string, b string")
    row = blocking_metrics(c, t, n_records=6).collect()[0]
    # canonical candidates: {12, 13, 45} (duplicate direction folds)
    assert row["n_candidates"] == 3
    assert row["n_truth"] == 3 and row["n_hit"] == 2
    assert row["pc_micro"] == 666667  # 2/3 round-half-up
    assert row["pq_micro"] == 666667
    assert row["rr_micro"] == 800000  # 1 - 3/15
    import pytest

    with pytest.raises(ValueError):
        blocking_metrics(c, t, n_records=1)

    con = duckdb.connect()
    con.execute("CREATE TABLE c (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", cand)
    con.execute("CREATE TABLE t (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", truth)
    oracle = con.execute("""
        WITH cc AS (
            SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM c),
        tt AS (
            SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM t),
        k AS (
            SELECT
                (SELECT count(*) FROM cc) AS nc,
                (SELECT count(*) FROM tt) AS nt,
                (SELECT count(*) FROM cc SEMI JOIN tt USING (a, b)) AS nh,
                6 * 5 // 2 AS tot)
        SELECT nc, nt, nh,
               (2 * 1000000 * nh + nt) // (2 * nt) AS pc,
               (2 * 1000000 * nh + nc) // (2 * nc) AS pq,
               (2 * 1000000 * (tot - nc) + tot) // (2 * tot) AS rr
        FROM k
    """).fetchone()
    assert tuple(row) == tuple(oracle)
