"""JL random projection (operators/projection.py) and SQ8 scalar
quantization (operators/quantize.py): python-model equivalence, the
JL distance-preservation property, quantization bounds/round-trip
error, integer-exact ADC scoring, and the zero-shuffle plan shapes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.projection import (
    project_py,
    projection_signs,
    random_projection,
)
from kg_microbe_merge_spark.operators.quantize import (
    sq8_encode,
    sq8_encode_py,
    sq8_reconstruct_py,
    sq8_topk,
    train_minmax,
)


def _vecs(spark, n=60, d=16, seed=7):
    """Deterministic pseudo-random float vectors (no RNG state)."""
    import hashlib

    rows = []
    for i in range(n):
        v = []
        for j in range(d):
            h = int.from_bytes(
                hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()[:4], "big"
            )
            v.append((h / 2**32) * 2.0 - 1.0)
        rows.append(Row(vec_id=i, embedding=v))
    return spark.createDataFrame(rows)


# --- projection -----------------------------------------------------------


def test_projection_matches_python_twin(spark):
    df = _vecs(spark, n=20, d=16)
    out = {
        r["vec_id"]: [r[f"p{j}"] for j in range(4)]
        for r in random_projection(df, k=4, d=16).collect()
    }
    for row in df.collect():
        assert out[row["vec_id"]] == project_py(row["embedding"], k=4)


def test_projection_signs_deterministic_and_balanced():
    s1 = projection_signs(8, 64)
    s2 = projection_signs(8, 64)
    assert s1 == s2
    flat = [x for row in s1 for x in row]
    assert set(flat) == {-1, 1}
    # md5 parity should be near-balanced — catches a degenerate matrix
    assert 0.35 < flat.count(1) / len(flat) < 0.65


def test_projection_preserves_distances_approximately(spark):
    # JL with k=8 on 16-dim inputs: rank correlation of pairwise
    # distances should be strongly positive (not a tight epsilon —
    # k is small; this guards against sign/scale bugs, where the
    # correlation collapses)
    df = _vecs(spark, n=30, d=16)
    orig = {r["vec_id"]: r["embedding"] for r in df.collect()}
    proj = {
        r["vec_id"]: [r[f"p{j}"] for j in range(8)]
        for r in random_projection(df, k=8, d=16).collect()
    }

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ids = sorted(orig)
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    d_orig = [dist(orig[a], orig[b]) for a, b in pairs]
    d_proj = [dist(proj[a], proj[b]) for a, b in pairs]
    # Spearman-ish: correlation of ranks
    import statistics

    def ranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        r = [0.0] * len(xs)
        for rank, i in enumerate(order):
            r[i] = float(rank)
        return r

    ro, rp = ranks(d_orig), ranks(d_proj)
    corr = statistics.correlation(ro, rp)
    assert corr > 0.5, corr


def test_projection_plan_has_no_exchange(spark):
    df = _vecs(spark, n=10, d=16)
    plan = random_projection(df, k=4, d=16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- quantization ---------------------------------------------------------


def test_sq8_encode_bounds_and_python_twin(spark):
    df = _vecs(spark, n=25, d=16)
    mn, mx = train_minmax(df, d=16)
    assert all(a <= b for a, b in zip(mn, mx))
    rows = {r["vec_id"]: r["code"] for r in sq8_encode(df, mn, mx).collect()}
    for row in df.collect():
        code = rows[row["vec_id"]]
        assert len(code) == 16
        assert all(0 <= c <= 255 for c in code)
        assert code == sq8_encode_py(row["embedding"], mn, mx)


def test_sq8_roundtrip_error_bounded(spark):
    df = _vecs(spark, n=25, d=16)
    mn, mx = train_minmax(df, d=16)
    for row in df.collect():
        code = sq8_encode_py(row["embedding"], mn, mx)
        rec = sq8_reconstruct_py(code, mn, mx)
        for v, r, lo, hi in zip(row["embedding"], rec, mn, mx):
            # max quantization error is half a bucket
            assert abs(float(v) - r) <= (hi - lo) / 255.0 / 2 + 1e-9


def test_sq8_constant_dimension_is_zero_code(spark):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.5, float(i)]) for i in range(4)]
    )
    mn, mx = train_minmax(df, d=2)
    codes = {r["vec_id"]: r["code"] for r in sq8_encode(df, mn, mx, code_col="code").collect()}
    assert all(codes[i][0] == 0 for i in range(4))  # constant dim
    assert codes[0][1] == 0 and codes[3][1] == 255  # full range


def test_sq8_topk_agrees_with_float_cosine_topk(spark):
    # quantized neighbor ranking should strongly overlap exact cosine
    df = _vecs(spark, n=50, d=16)
    vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
    q = vecs[0]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return num / (na * nb)

    exact = sorted(
        ((cos(q, v), i) for i, v in vecs.items() if i != 0), reverse=True
    )
    exact_top = {i for _, i in exact[:10]}
    got = sq8_topk(df, query_id=0, k=10, d=16).collect()
    got_ids = {r["vec_id"] for r in got}
    assert len(got_ids & exact_top) >= 7
    # ranks are 1..k, total order, qdot integral
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == list(
        range(1, 11)
    )
    assert all(isinstance(r["qdot"], int) for r in got)


def test_sq8_encode_plan_has_no_exchange(spark):
    df = _vecs(spark, n=10, d=16)
    mn, mx = train_minmax(df, d=16)
    plan = sq8_encode(df, mn, mx)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
