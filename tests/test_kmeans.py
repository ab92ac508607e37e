"""k-means correctness: well-separated blobs recover ground truth, and
assignments match a pure-Python model of the identical recurrence
(hash60 init, round-6 distances and means, ties to smallest cid)."""

from __future__ import annotations

import random

from kg_microbe_merge_spark.functions.hashing import hash60_py
from kg_microbe_merge_spark.operators.kmeans import kmeans_assignments


def _model(
    rows: list[tuple[int, list[float]]], k: int, iterations: int
) -> dict[int, int]:
    """The operator's recurrence in plain Python."""
    init = sorted(rows, key=lambda r: (hash60_py(str(r[0])), r[0]))[:k]
    cents = [list(v) for _, v in init]

    def dist2(a, b):
        return round(sum((x - y) * (x - y) for x, y in zip(a, b)), 6)

    def assign():
        return {
            i: min(range(len(cents)), key=lambda c: (dist2(v, cents[c]), c))
            for i, v in rows
        }

    a = assign()
    for _ in range(iterations - 1):
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for i, v in rows:
            c = a[i]
            s = sums.setdefault(c, [0.0] * len(v))
            for p, x in enumerate(v):
                s[p] += x
            counts[c] = counts.get(c, 0) + 1
        for c in range(len(cents)):
            if c in counts:
                cents[c] = [round(s / counts[c], 6) for s in sums[c]]
        a = assign()
    return a


def _blobs(rng, centers, n_per, spread=0.05):
    rows = []
    i = 0
    for cx in centers:
        for _ in range(n_per):
            rows.append(
                (i, [x + rng.uniform(-spread, spread) for x in cx])
            )
            i += 1
    return rows


def test_blobs_recovered(spark):
    rng = random.Random(11)
    truth_centers = [[0.0, 0.0, 0.0], [5.0, 5.0, 0.0], [0.0, 9.0, 9.0]]
    rows = _blobs(rng, truth_centers, 20)
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assignments(df, k=3, iterations=4).collect()
    }
    # every blob lands in ONE cluster; different blobs in different ones
    blob_of = {i: i // 20 for i, _ in rows}
    labels = {}
    for i, c in got.items():
        labels.setdefault(blob_of[i], set()).add(c)
    assert all(len(s) == 1 for s in labels.values())
    assert len({next(iter(s)) for s in labels.values()}) == 3


def test_matches_python_model(spark):
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assignments(df, k=4, iterations=3).collect()
    }
    # model must see the float32-truncated values Spark reads back
    import numpy as np

    f32rows = [(i, [float(np.float32(x)) for x in v]) for i, v in rows]
    assert got == _model(f32rows, k=4, iterations=3)


def test_empty_cluster_keeps_centroid(spark):
    # 3 distinct points, k=3, but two coincide with the third far away:
    # after round 1 one centroid may own nothing — iteration must not
    # fail and every point keeps a cluster in [0, 3)
    rows = [(0, [0.0, 0.0]), (1, [0.01, 0.0]), (2, [0.02, 0.0]), (3, [9.0, 9.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kmeans_assignments(df, k=3, iterations=3).collect()
    assert len(got) == 4
    assert all(0 <= r["cluster"] < 3 for r in got)
