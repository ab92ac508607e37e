"""Unigram-LM tokenizer (operators/unigram_lm.py): seed vocabulary,
lattice-SSSP segmentation vs the DP twin, walk-enumeration cost
oracle, hard-EM training properties."""

from __future__ import annotations

import duckdb
import pytest

from kg_microbe_merge_spark.operators.unigram_lm import (
    MICRO,
    seed_vocab,
    segment_cost_sql,
    segment_py,
    segment_words,
    unigram_train,
    vocab_costs,
)

WORDS = [
    ("internationalization", 3),
    ("international", 8),
    ("nation", 20),
    ("nations", 11),
    ("nature", 7),
    ("intern", 5),
    ("ration", 4),
    ("station", 6),
]


def _words_df(spark, rows=None):
    return spark.createDataFrame(rows or WORDS, "word string, freq long")


def test_seed_vocab_coverage_and_ordering(spark):
    v = seed_vocab(_words_df(spark), max_piece_len=4, vocab_size=10)
    rows = {r["piece"]: r["count"] for r in v.collect()}
    # every character of the corpus present
    chars = {c for w, _ in WORDS for c in w}
    assert chars <= set(rows)
    multi = [p for p in rows if len(p) > 1]
    assert len(multi) == 10
    # 'atio' / 'tion' are the dominant 4-grams
    assert "tion" in multi and "atio" in multi


def test_segmentation_matches_dp_twin(spark):
    words = _words_df(spark)
    costs = vocab_costs(
        seed_vocab(words, max_piece_len=5, vocab_size=12)
    )
    cost_map = {
        r["piece"]: r["cost_micro"] for r in costs.collect()
    }
    got = {
        r["word"]: (r["cost_micro"], list(r["pieces"]))
        for r in segment_words(words, costs, max_piece_len=5).collect()
    }
    want = segment_py(WORDS, cost_map, max_piece_len=5)
    assert got == want
    # every segmentation reassembles its word
    for w, (_, pieces) in got.items():
        assert "".join(pieces) == w


def test_cost_against_walk_enumeration_oracle(spark):
    words = _words_df(spark)
    costs = vocab_costs(
        seed_vocab(words, max_piece_len=4, vocab_size=8)
    )
    wvals = ", ".join(f"('{w}', {f})" for w, f in WORDS)
    cvals = ", ".join(
        f"('{r['piece']}', {r['cost_micro']})" for r in costs.collect()
    )
    sql = segment_cost_sql(
        f"SELECT w AS word, f AS freq FROM (VALUES {wvals}) t(w, f)",
        f"SELECT p AS piece, c AS cost_micro FROM (VALUES {cvals}) t(p, c)",
        max_piece_len=4,
    )
    want = dict(duckdb.sql(sql).fetchall())
    got = {
        r["word"]: r["cost_micro"]
        for r in segment_words(words, costs, max_piece_len=4)
        .select("word", "cost_micro")
        .collect()
    }
    assert got == want and got


def test_training_shrinks_vocab_and_reduces_corpus_cost(spark):
    words = _words_df(spark)
    seed = vocab_costs(seed_vocab(words, max_piece_len=5, vocab_size=30))
    seed_cost = sum(
        r["freq"] * r["cost_micro"]
        for r in segment_words(words, seed, max_piece_len=5).collect()
    )
    trained = unigram_train(
        words, rounds=2, vocab_size=6, max_piece_len=5
    )
    rows = trained.collect()
    multi = [r for r in rows if len(r["piece"]) > 1]
    assert 0 < len(multi) <= 6
    # single chars all retained as coverage fallbacks
    chars = {c for w, _ in WORDS for c in w}
    assert chars <= {r["piece"] for r in rows}
    # the trained vocabulary still segments everything
    seg = segment_words(words, trained, max_piece_len=5)
    assert seg.count() == len(WORDS)
    for r in seg.collect():
        assert "".join(r["pieces"]) == r["word"]
    # usage concentrated: kept multi-char pieces were actually used
    assert all(r["count"] > 0 for r in multi)
    assert seed_cost > 0


def test_max_word_len_cap_and_guard(spark):
    words = _words_df(spark, [("short", 1), ("x" * 30, 1)])
    costs = vocab_costs(seed_vocab(words, max_piece_len=3, vocab_size=5))
    out = segment_words(words, costs, max_word_len=24)
    assert [r["word"] for r in out.collect()] == ["short"]
    with pytest.raises(ValueError, match="rounds"):
        unigram_train(words, rounds=0)
