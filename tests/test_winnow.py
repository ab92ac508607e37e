"""Winnowing fingerprints (operators/winnow.py): python-twin
equivalence, the w+k-1 shared-run guarantee, sublinear selection,
degenerate short docs, and overlap-pair semantics."""

from __future__ import annotations

from pyspark.sql import Row

from kg_microbe_merge_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
    winnow_py,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_fingerprints_match_python_twin(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs",
        "a b",          # shorter than k → no fingerprints
        "a b c d",      # ≥k grams but fewer than w → global min
        "",
    ]
    df = _docs(spark, texts)
    got: dict[int, set] = {i: set() for i in range(len(texts))}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        got[r["doc_id"]].add(r["fp"])
    for i, t in enumerate(texts):
        assert got[i] == winnow_py(t, k=3, w=4), i


def test_shared_run_guarantee(spark):
    # two docs sharing a run of w+k-1 = 6 tokens MUST share ≥1 print
    shared = "one two three four five six"
    texts = [
        f"alpha beta {shared} gamma delta",
        f"zz yy xx {shared} ww vv",
        "completely different words entirely here now",
    ]
    df = _docs(spark, texts)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared"]
        for r in winnow_overlap_pairs(
            df, k=3, w=4, min_shared=1, max_doc_freq=50
        ).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_selection_is_sublinear(spark):
    text = " ".join(f"w{i}" for i in range(200))  # 200 distinct tokens
    df = _docs(spark, [text])
    n_fp = winnow_fingerprints(df, k=5, w=8).count()
    n_grams = 200 - 5 + 1
    # winnowing expectation ≈ 2/(w+1) of grams; allow generous slack
    assert n_fp < n_grams * 0.5
    assert n_fp >= n_grams // (8 + 1)  # at least one per disjoint window


def test_doc_freq_ceiling_drops_boilerplate(spark):
    # a 6-token boilerplate shared by ALL docs; pairs must vanish when
    # the ceiling excludes prints present in > max_doc_freq docs
    boiler = "all rights reserved contact us today"
    texts = [f"{boiler} unique{i} tail{i} words{i} here{i}" for i in range(6)]
    df = _docs(spark, texts)
    loose = winnow_overlap_pairs(
        df, k=3, w=4, min_shared=1, max_doc_freq=50
    ).count()
    strict = winnow_overlap_pairs(
        df, k=3, w=4, min_shared=1, max_doc_freq=3
    ).count()
    assert loose > 0 and strict == 0
