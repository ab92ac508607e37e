"""PMI collocation mining (operators/collocations.py) vs python twin."""

from __future__ import annotations

from pyspark.sql import Row

from kg_microbe_merge_spark.operators.collocations import (
    pmi_collocations,
    pmi_py,
)


def _df(spark, docs):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )


def _collect(spark, docs, min_count, top_k):
    return [
        (
            r["w1"],
            r["w2"],
            r["n_pair"],
            r["n_w1"],
            r["n_w2"],
            r["pmi_micro"],
            r["npmi_micro"],
        )
        for r in pmi_collocations(
            _df(spark, docs), min_count=min_count, top_k=top_k
        ).collect()
    ]


CORPUS = [
    "the new york times reported the story",
    "she moved to new york last year",
    "new york is large and the harbor is old",
    "the story of the year was the harbor",
    "a new day in york county has the old harbor",
    "the new york harbor is the old one",
]


def test_matches_python_twin(spark):
    got = _collect(spark, CORPUS, min_count=2, top_k=20)
    assert got == pmi_py(CORPUS, min_count=2, top_k=20)


def test_collocation_beats_frequent_independent_pair(spark):
    rows = _collect(spark, CORPUS, min_count=2, top_k=50)
    by_pair = {(a, b): npmi for a, b, *_, npmi in rows}
    # "new york" is a true collocation; "the" pairs are frequent but
    # independent — NPMI must separate them
    ny = by_pair[("new", "york")]
    the_pairs = [v for (a, b), v in by_pair.items() if a == "the" or b == "the"]
    assert the_pairs and all(ny > v for v in the_pairs), by_pair


def test_min_count_prunes_hapax(spark):
    rows = _collect(spark, CORPUS, min_count=3, top_k=50)
    assert all(n >= 3 for _, _, n, *_ in rows)
    assert ("last", "year") not in {(a, b) for a, b, *_ in rows}


def test_perfect_collocation_saturates_npmi(spark):
    # tokens that ONLY ever occur inside the pair saturate the score:
    # npmi >= 1 (doc-edge slots can push a perfect pair slightly above
    # 1 on a tiny corpus — the bound is asymptotic; see module
    # docstring) and the pair ranks first
    docs = ["aaa bbb ccc", "ddd aaa bbb", "aaa bbb eee fff"]
    rows = _collect(spark, docs, min_count=2, top_k=5)
    top = rows[0]
    assert (top[0], top[1]) == ("aaa", "bbb")
    assert top[6] >= 1_000_000
    assert all(r[6] < top[6] for r in rows[1:])


def test_deterministic_tiebreak_and_limit(spark):
    docs = ["x1 y1 . x2 y2 ."] * 4
    rows = _collect(spark, docs, min_count=2, top_k=3)
    assert rows == pmi_py(docs, min_count=2, top_k=3)
    assert len(rows) == 3


def test_empty_and_short_docs_contribute_nothing(spark):
    docs = ["", "solo", "a b a b a b"]
    got = _collect(spark, docs, min_count=2, top_k=10)
    assert got == pmi_py(docs, min_count=2, top_k=10)
    assert {(a, b) for a, b, *_ in got} == {("a", "b"), ("b", "a")}


def test_degenerate_pair_owns_all_bigrams(spark):
    # every bigram instance IS the pair: -ln p(xy) = 0, so the three
    # twins agree on the always-co-occur convention npmi = 1
    docs = ["new york"] * 5
    rows = _collect(spark, docs, min_count=5, top_k=5)
    assert rows == pmi_py(docs, min_count=5, top_k=5)
    assert rows[0][:2] == ("new", "york")
    assert rows[0][6] == 1_000_000
