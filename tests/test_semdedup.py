"""SemDeDup (operators/semdedup.py): within-cluster pairs + survivors
match a pure-Python twin (reusing the kmeans recurrence model),
transitive chains collapse to one survivor, and no-pair corpora keep
everything."""

from __future__ import annotations

import math
import random

from kg_microbe_merge_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_pairs,
)
from tests.test_kmeans import _model


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return v if n == 0 else [x / n for x in v]


def py_semdedup(rows, k, iterations, threshold):
    assign = _model(rows, k, iterations)
    unit = {i: _unit(v) for i, v in rows}
    pairs = []
    for i, _ in rows:
        for j, _ in rows:
            if i < j and assign[i] == assign[j]:
                cos = round(
                    sum(a * b for a, b in zip(unit[i], unit[j])), 6
                )
                if cos >= threshold:
                    pairs.append((i, j, assign[i], cos))
    # union-find -> min-id canonical
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for i, _ in rows:
        canon = find(i)
        out[i] = (assign[i], canon, canon == i)
    return pairs, out


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )


def _blobs_with_dups(rng, n_per=10):
    rows = []
    i = 0
    for cx in ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]):
        for _ in range(n_per):
            rows.append(
                (i, [x + rng.uniform(-0.3, 0.3) for x in cx])
            )
            i += 1
    # planted near-dup chain inside blob 0: 100~101, 101~102
    rows.append((100, [1.0, 0.01, 0.0]))
    rows.append((101, [1.0, 0.012, 0.0]))
    rows.append((102, [1.0, 0.012, 0.002]))
    return rows


def test_matches_python_twin(spark):
    rng = random.Random(11)
    rows = _blobs_with_dups(rng)
    df = _mk(spark, rows)
    want_pairs, want = py_semdedup(rows, k=2, iterations=2, threshold=0.999)

    got_pairs = sorted(
        (r["id_a"], r["id_b"], r["cluster"], r["cosine"])
        for r in semantic_dedup_pairs(
            df, k=2, iterations=2, threshold=0.999
        ).collect()
    )
    assert got_pairs == sorted(want_pairs)
    assert len(got_pairs) >= 2  # the planted chain produced pairs

    got = {
        r["vec_id"]: (r["cluster"], r["canonical_id"], r["kept"])
        for r in semantic_dedup(
            df, k=2, iterations=2, threshold=0.999
        ).collect()
    }
    assert got == want


def test_transitive_chain_one_survivor(spark):
    rng = random.Random(5)
    rows = _blobs_with_dups(rng)
    df = _mk(spark, rows)
    got = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, k=2, iterations=2, threshold=0.999
        ).collect()
    }
    # 100, 101, 102 form one group via the 101 bridge; min id survives
    assert got[100]["canonical_id"] == 100 and got[100]["kept"]
    assert got[101]["canonical_id"] == 100 and not got[101]["kept"]
    assert got[102]["canonical_id"] == 100 and not got[102]["kept"]


def test_no_pairs_keeps_everything(spark):
    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(12)]
    df = _mk(spark, rows)
    out = semantic_dedup(df, k=3, iterations=2, threshold=1.000001)
    rs = out.collect()
    assert len(rs) == 12
    assert all(r["kept"] and r["canonical_id"] == r["vec_id"] for r in rs)
