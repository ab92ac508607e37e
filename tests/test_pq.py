"""Product quantization (operators/pq.py): training matches a
pure-Python Lloyd twin on exact-integer vectors, encode matches the
row twin, ADC top-k matches exhaustive twin scoring, reconstruction
error shrinks with training, and encode/top-k are shuffle-free."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from kg_microbe_merge_spark.functions.hashing import hash60_py
from kg_microbe_merge_spark.operators.pq import (
    _dist2_py,
    pq_adc_py,
    pq_encode,
    pq_encode_py,
    pq_topk,
    train_pq_codebooks,
)

DIM, M, K = 8, 4, 3


def _vecs(n):
    # integer-valued, so every float sum is exact and the python twin
    # reproduces the distributed arithmetic bit-for-bit
    return [
        (i, [float((i * 7 + j * 13 + (i * j) % 5) % 23) for j in range(DIM)])
        for i in range(n)
    ]


def _df(spark, data):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in data]
    )


def _train_py(data, m, k, iterations):
    sub = DIM // m
    init_ids = sorted(data, key=lambda iv: (hash60_py(str(iv[0])), iv[0]))[:k]
    books = [
        [list(v[j * sub : (j + 1) * sub]) for _, v in init_ids]
        for j in range(m)
    ]
    for _ in range(iterations - 1):
        sums = {}
        counts = {}
        for _, v in data:
            codes = pq_encode_py(v, books)
            for j in range(m):
                key = (j, codes[j])
                s = sums.setdefault(key, [0.0] * sub)
                for p in range(sub):
                    s[p] += v[j * sub + p]
                counts[key] = counts.get(key, 0) + 1
        books = [
            [
                [
                    round(sums[(j, c)][p] / counts[(j, c)], 6)
                    for p in range(sub)
                ]
                if (j, c) in counts
                else books[j][c]
                for c in range(k)
            ]
            for j in range(m)
        ]
    return books


def test_training_matches_python_twin(spark):
    data = _vecs(40)
    got = train_pq_codebooks(_df(spark, data), m=M, k=K, iterations=3)
    assert got == _train_py(data, M, K, 3)


def test_encode_and_topk_match_twins(spark):
    data = _vecs(40)
    books = train_pq_codebooks(_df(spark, data), m=M, k=K, iterations=2)
    enc = {
        r.vec_id: list(r.codes)
        for r in pq_encode(_df(spark, data), books).collect()
    }
    assert enc == {i: pq_encode_py(v, books) for i, v in data}

    q = [float(x) for x in range(DIM)]
    rows = pq_topk(pq_encode(_df(spark, data), books), q, books, k=5).collect()
    want = sorted(
        ((pq_adc_py(enc[i], q, books), i) for i, _ in data)
    )[:5]
    assert [(r.dist2, r.vec_id) for r in rows] == want


def test_training_reduces_quantization_error(spark):
    data = _vecs(60)
    df = _df(spark, data)
    b1 = train_pq_codebooks(df, m=M, k=K, iterations=1)
    b3 = train_pq_codebooks(df, m=M, k=K, iterations=3)
    sub = DIM // M

    def err(books):
        t = 0.0
        for _, v in data:
            codes = pq_encode_py(v, books)
            for j in range(M):
                t += _dist2_py(
                    v[j * sub : (j + 1) * sub], books[j][codes[j]]
                )
        return t

    assert err(b3) <= err(b1)


def test_dim_validation(spark):
    df = _df(spark, _vecs(10))
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(df, m=3, k=2)
    books = train_pq_codebooks(df, m=M, k=K, iterations=1)
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(pq_encode(df, books), [1.0], books)


def test_encode_and_topk_are_shuffle_free(spark):
    df = _df(spark, _vecs(20))
    books = train_pq_codebooks(df, m=M, k=K, iterations=1)
    enc_plan = pq_encode(df, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in enc_plan
    topk_plan = pq_topk(pq_encode(df, books), [0.0] * DIM, books, k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in topk_plan
    assert "TakeOrderedAndProject" in topk_plan


def test_ivf_pq_partition_pruned_search(spark, tmp_path):
    from kg_microbe_merge_spark.operators.pq import (
        ivf_pq_topk,
        pq_topk,
        probe_cells,
        train_coarse_centroids,
        write_pq_index,
    )

    data = _vecs(60)
    df = _df(spark, data)
    coarse = train_coarse_centroids(df, n_cells=4, iterations=2)
    books = train_pq_codebooks(df, m=M, k=K, iterations=2)
    idx = str(tmp_path / "pqidx")
    write_pq_index(df, idx, coarse, books)

    q = [float((i * 5) % 11) for i in range(DIM)]
    got = ivf_pq_topk(spark, idx, q, coarse, books, n_probe=2, k=5)

    # plan: the cell predicate became a PARTITION filter (directory
    # pruning), not a data filter — the scan never lists the other
    # cells' files. (inputFiles() reflects the pre-pruning relation,
    # so the plan text is the physical evidence here.)
    plan = got._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [cell" in scan and " IN (" in scan
    assert "DataFilters: []" in scan

    # value twin: brute ADC restricted to the probed cells
    cells = set(probe_cells(q, coarse, 2))
    assert len(cells) == 2
    member = {
        i: pq_encode_py(v, [coarse])[0] for i, v in data
    }
    enc = {i: pq_encode_py(v, books) for i, v in data}
    want = sorted(
        (pq_adc_py(enc[i], q, books), i)
        for i, _ in data
        if member[i] in cells
    )[:5]
    assert [(r.dist2, r.vec_id) for r in got.collect()] == want

    # the index layout actually split the corpus across cells (pruning
    # has something to skip) and every row lives in exactly one cell dir
    import os

    cell_dirs = [d for d in os.listdir(idx) if d.startswith("cell=")]
    assert len(cell_dirs) >= 3
    assert spark.read.parquet(idx).count() == len(data)
