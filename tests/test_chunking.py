"""Sliding-window chunking (operators/chunking.py): value-level cases,
a pure-Python oracle over randomized docs, and the zero-exchange plan
guarantee."""

from __future__ import annotations

import random

import pytest

from kg_microbe_merge_spark.operators.chunking import chunk_documents


def _py_chunks(text: str, window: int, stride: int):
    toks = text.split()
    if not toks:
        return []
    out = []
    k = 0
    while True:
        s = k * stride
        piece = toks[s : s + window]
        out.append((k, " ".join(piece), len(piece)))
        if s + window >= len(toks):
            return out
        k += 1


def _collect(spark, rows, window, stride):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tok"])
        for r in chunk_documents(df, window=window, stride=stride).collect()
    )


def test_chunking_value_cases(spark):
    rows = [
        (1, "a b c d e f g"),   # 7 toks → chunks at 0 (4) and 3 (4)
        (2, "a b"),             # short doc → one chunk
        (3, ""),                # empty → none
        (4, "   \t  "),         # whitespace-only → none
        (5, "a b c d"),         # exactly window → one chunk
    ]
    got = _collect(spark, rows, window=4, stride=3)
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "d e f g", 4),
        (2, 0, "a b", 2),
        (5, 0, "a b c d", 4),
    ]


def test_chunking_normalizes_internal_whitespace(spark):
    got = _collect(spark, [(1, "  a\t\tb \n c  ")], window=2, stride=2)
    assert got == [(1, 0, "a b", 2), (1, 1, "c", 1)]


@pytest.mark.parametrize("window,stride", [(8, 8), (8, 5), (3, 1), (4, 3)])
def test_chunking_matches_python_oracle(spark, window, stride):
    rng = random.Random(13)
    rows = [
        (i, " ".join(f"t{rng.randrange(50)}" for _ in range(rng.randrange(30))))
        for i in range(60)
    ]
    got = _collect(spark, rows, window, stride)
    want = sorted(
        (i, k, txt, n)
        for i, text in rows
        for (k, txt, n) in _py_chunks(text, window, stride)
    )
    assert got == want


def test_chunking_plan_has_no_exchange(spark):
    # non-constant text so constant folding can't erase the split
    df = spark.range(10).selectExpr(
        "id AS doc_id", "concat(repeat('w ', 40), id) AS text"
    )
    out = chunk_documents(df, window=8, stride=6)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the tokenize-once barrier held: one split in the physical plan
    assert plan.count("split(") == 1


def test_chunking_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, window=0, stride=1)
    with pytest.raises(ValueError):
        chunk_documents(df, window=4, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(df, window=4, stride=5)
