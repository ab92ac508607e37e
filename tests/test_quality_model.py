"""Hashed-feature linear quality model (functions/quality_model.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.quality_model import (
    DEFAULT_DIM,
    SCALE,
    hashed_linear_score,
    model_keep,
    model_weights,
)
from kg_microbe_merge_spark.functions.hashing import hash60_py


def _py_score(text: str) -> float:
    """Python model twin: same normalize+split, same hash, same weights."""
    w = model_weights()
    norm = " ".join(text.lower().split())
    if not norm.strip():
        return 0.0
    toks = norm.split(" ")
    raw = sum(w[hash60_py(t) % DEFAULT_DIM] for t in toks)
    return round(raw / (SCALE * len(toks)), 6)


def test_weights_deterministic_and_bounded():
    w = model_weights()
    assert w == model_weights()
    assert len(w) == DEFAULT_DIM
    assert all(-SCALE <= x <= SCALE for x in w)
    # a stand-in model should use its full range, not collapse
    assert min(w) < 0 < max(w)


def test_matches_python_model(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "spark spark spark spark",
        "a",
        "  ",
        "",
        "Mixed CASE   and   extra    spaces here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["score"]
        for r in df.select(
            "doc_id", hashed_linear_score(F.col("text")).alias("score")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_score(t), (i, t)


def test_score_bounded_and_keep_threshold(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = docs.select(
        hashed_linear_score(F.col("text")).alias("s"),
        model_keep(F.col("text"), threshold=0.0).alias("keep"),
    )
    rows = out.collect()
    assert all(-1.0 <= r["s"] <= 1.0 for r in rows)
    assert all(r["keep"] == (r["s"] >= 0.0) for r in rows)
    # the stand-in model must actually split the corpus, not rubber-stamp
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)


def test_zero_shuffle_plan(spark):
    """Model inference must fuse into the scan: no Exchange in the plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        docs.select(hashed_linear_score(F.col("text")).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pandas_broadcast_path_matches_literal_path(spark):
    """The mapInPandas broadcast-weights path (the large-model route)
    must reproduce the literal/codegen path value-for-value."""
    from kg_microbe_merge_spark.functions.quality_model import (
        hashed_linear_score_pandas,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lit = docs.select(
        "doc_id", hashed_linear_score(F.col("text")).alias("model_score")
    )
    pnd = hashed_linear_score_pandas(docs).select("doc_id", "model_score")
    a = {r["doc_id"]: r["model_score"] for r in lit.collect()}
    b = {r["doc_id"]: r["model_score"] for r in pnd.collect()}
    assert a == b


def test_pandas_path_handles_nulls_and_empties(spark):
    from kg_microbe_merge_spark.functions.quality_model import (
        hashed_linear_score_pandas,
    )

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "one token here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["model_score"]
           for r in hashed_linear_score_pandas(df).collect()}
    assert got[0] == 0.0 and got[1] == 0.0 and got[2] == 0.0
    assert got[3] == _py_score("one token here")
