"""Vocabulary induction / BPE pair counting (operators/vocab.py)."""

from __future__ import annotations

from kg_microbe_merge_spark.operators.vocab import (
    bpe_pair_counts,
    token_counts,
    top_vocab,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d1", "the cat sat on the mat"),
            ("d2", "the cat ate"),
            ("d3", "a dog sat"),
            ("d4", ""),
            ("d5", "   "),
        ],
        "doc_id string, text string",
    )


def test_token_counts_exact(spark):
    got = {r["token"]: r["n"] for r in token_counts(_docs(spark)).collect()}
    assert got == {
        "the": 3, "cat": 2, "sat": 2, "on": 1, "mat": 1,
        "ate": 1, "a": 1, "dog": 1,
    }


def test_top_vocab_stable_ids_and_tiebreak(spark):
    rows = top_vocab(_docs(spark), size=4).collect()
    got = [(r["token_id"], r["token"], r["n"]) for r in
           sorted(rows, key=lambda r: r["token_id"])]
    # count DESC, then token ASC: the(3), cat(2), sat(2), then the
    # 1-count block in lexicographic order starting at 'a'
    assert got == [(0, "the", 3), (1, "cat", 2), (2, "sat", 2), (3, "a", 1)]


def test_top_vocab_min_count(spark):
    toks = {r["token"] for r in
            top_vocab(_docs(spark), size=100, min_count=2).collect()}
    assert toks == {"the", "cat", "sat"}


def test_bpe_pair_counts_exact(spark):
    got = {(r["lhs"], r["rhs"]): r["n"]
           for r in bpe_pair_counts(_docs(spark)).collect()}
    assert got[("the", "cat")] == 2
    assert got[("cat", "sat")] == 1
    assert got[("cat", "ate")] == 1
    # empty/blank docs and single-token docs contribute no pairs
    assert sum(got.values()) == 5 + 2 + 2  # total adjacent pairs
    assert all(lhs and rhs for lhs, rhs in got)
