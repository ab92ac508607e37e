"""BPE merge training + segmentation (operators/bpe.py) vs the pure
Python reference trainer and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from kg_microbe_merge_spark.operators.bpe import (
    bpe_encode_udf,
    bpe_merges_sql,
    bpe_train,
    bpe_train_py,
    merges_df,
    segment_words,
    segment_words_sql,
    symbol_counts,
)

TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "the low new low the the",
    "wider wide widest new low",
    "low low low lower newer the",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_train_matches_python_twin(spark):
    merges, state = bpe_train(_docs(spark), n_merges=12)
    py_merges, py_syms = bpe_train_py(TEXTS, n_merges=12)
    assert merges == py_merges
    got_syms = {
        r["symbol"]: r["n"] for r in symbol_counts(state).collect()
    }
    assert got_syms == py_syms


def test_train_matches_duckdb_twin(spark):
    merges, _ = bpe_train(_docs(spark), n_merges=8)
    con = duckdb.connect()
    rows = [(i, t) for i, t in enumerate(TEXTS)]
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    sql = bpe_merges_sql("SELECT text FROM docs", n_merges=8)
    got = con.execute(sql).fetchall()
    assert [(r, l, h, n) for r, l, h, n in got] == merges


def test_early_stop_when_no_pair_repeats(spark):
    # every word unique, every char-pair count 1 -> min_pair_count=2
    # stops immediately
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    merges, _ = bpe_train(docs, n_merges=5)
    assert merges == []


def test_greedy_run_semantics(spark):
    # 'aaaa' must merge as [aa, aa], never [a, aa, a] — left-to-right
    # non-overlapping scan in both engines
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    merges, state = bpe_train(docs, n_merges=1)
    assert merges[0][1:3] == ("a", "a")
    syms = {r["symbol"]: r["n"] for r in symbol_counts(state).collect()}
    assert syms["aa"] == 6 and "a" not in syms


def test_segment_words_matches_training_state_and_sql(spark):
    merges, state = bpe_train(_docs(spark), n_merges=10)
    words = spark.createDataFrame(
        [("low",), ("lowest",), ("newer",), ("unseen",), ("the",)],
        "word string",
    )
    seg = {
        r["word"]: (r["segmented"], r["n_pieces"])
        for r in segment_words(words, merges).collect()
    }
    # training words segment to their final training state
    final = {
        tuple(r["wstr"].strip().split("  ")) for r in state.collect()
    }
    for w in ("low", "lowest", "newer", "the"):
        assert tuple(seg[w][0].split(" ")) in final
    # DuckDB chain twin
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE w(word VARCHAR); INSERT INTO w VALUES "
        "('low'),('lowest'),('newer'),('unseen'),('the')"
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            segment_words_sql("SELECT word FROM w", merges)
        ).fetchall()
    }
    assert got == seg


def test_pandas_encoder_equals_replace_chain(spark):
    merges, _ = bpe_train(_docs(spark), n_merges=10)
    words = spark.createDataFrame(
        [("low",), ("lowering",), ("newest",), ("zzz",), ("widest",)],
        "word string",
    )
    chain = {
        r["word"]: r["segmented"]
        for r in segment_words(words, merges).collect()
    }
    enc = bpe_encode_udf(merges)
    udf = {
        r["word"]: r["seg"]
        for r in words.select("word", enc("word").alias("seg")).collect()
    }
    assert udf == chain


def test_merges_df_schema(spark):
    merges, _ = bpe_train(_docs(spark), n_merges=3)
    df = merges_df(spark, merges)
    assert df.columns == ["rank", "lhs", "rhs", "n"]
    assert df.count() == len(merges)


def test_n_merges_validation(spark):
    with pytest.raises(ValueError):
        bpe_train(_docs(spark), n_merges=0)
