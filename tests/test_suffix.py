"""Suffix arrays by prefix doubling (operators/suffix.py): ranks match
the brute-force sorted-suffixes twin on crafted and random sequences,
the corpus token stream assigns contiguous hash-order positions, and
the end-to-end corpus suffix array is a valid permutation."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.hashing import hash60_py
from kg_microbe_merge_spark.operators.suffix import (
    corpus_token_stream,
    suffix_array,
    suffix_ranks,
)


def py_suffix_ranks(toks: list[str]) -> dict[int, int]:
    order = sorted(range(len(toks)), key=lambda i: toks[i:])
    return {pos: r for r, pos in enumerate(order)}


def _ranks(spark, toks):
    df = spark.createDataFrame(
        list(enumerate(toks)), "pos long, token string"
    )
    return {
        r["pos"]: r["rank"] for r in suffix_ranks(df).collect()
    }


def test_known_sequences(spark):
    for toks in (
        ["b", "a", "n", "a", "n", "a"],
        ["a"],
        ["a", "a", "a", "a", "a"],
        ["the", "cat", "the", "cat", "the", "dog"],
        ["ab", "b", "a", "ab"],
    ):
        assert _ranks(spark, toks) == py_suffix_ranks(toks), toks


def test_random_sequences(spark):
    rng = random.Random(31)
    vocab = ["a", "b", "ab", "ba", "x", "yz"]
    for n in (2, 17, 64, 130):
        toks = [rng.choice(vocab) for _ in range(n)]
        assert _ranks(spark, toks) == py_suffix_ranks(toks), n


def test_corpus_token_stream_positions(spark):
    docs = [
        ("d1", "alpha beta gamma"),
        ("d2", ""),
        ("d3", "delta   epsilon"),
        ("d4", "zeta"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = corpus_token_stream(df, n_buckets=3).collect()
    # contiguous positions 0..n-1
    assert sorted(r["pos"] for r in out) == list(range(6))
    # within-doc order and tokens preserved; empty doc absent
    by_doc = {}
    for r in sorted(out, key=lambda r: r["pos"]):
        by_doc.setdefault(r["doc_id"], []).append(r["token"])
    assert by_doc.keys() == {"d1", "d3", "d4"}
    assert by_doc["d1"] == ["alpha", "beta", "gamma"]
    assert by_doc["d3"] == ["delta", "epsilon"]
    # doc blocks follow the deterministic hash order
    order = sorted(
        ("d1", "d3", "d4"), key=lambda d: (hash60_py(f"{d}:sfx"), d)
    )
    first_pos = {
        d: min(r["pos"] for r in out if r["doc_id"] == d)
        for d in ("d1", "d3", "d4")
    }
    assert sorted(first_pos, key=first_pos.get) == order


def test_corpus_suffix_array_end_to_end(spark):
    rng = random.Random(9)
    vocab = ["the", "cat", "sat", "on", "mat", "dog"]
    docs = [
        (f"d{i}", " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
        for i in range(6)
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    stream = corpus_token_stream(df)
    toks = [
        r["token"]
        for r in stream.orderBy("pos").select("token").collect()
    ]
    sa = {r["rank"]: r["pos"] for r in suffix_array(stream).collect()}
    want = {
        r: p for p, r in py_suffix_ranks(toks).items()
    }
    assert sa == want
    # a permutation of 0..n-1 on both axes
    n = len(toks)
    assert sorted(sa) == list(range(n)) and sorted(sa.values()) == list(
        range(n)
    )


def test_empty_input(spark):
    df = spark.createDataFrame([], "pos long, token string")
    assert suffix_ranks(df).count() == 0


def py_lcp_adjacent(toks):
    ranks = py_suffix_ranks(toks)
    sa = {r: p for p, r in ranks.items()}
    out = {}
    for r in range(1, len(toks)):
        i, j = sa[r], sa[r - 1]
        l = 0
        while i + l < len(toks) and j + l < len(toks) and toks[i + l] == toks[j + l]:
            l += 1
        out[r] = (sa[r], sa[r - 1], l)
    return out


def _lcp(spark, toks):
    from kg_microbe_merge_spark.operators.suffix import lcp_adjacent

    df = spark.createDataFrame(
        list(enumerate(toks)), "pos long, token string"
    )
    return {
        r["rank"]: (r["pos"], r["prev_pos"], r["lcp"])
        for r in lcp_adjacent(df).collect()
    }


def test_lcp_known_and_random(spark):
    cases = [
        ["b", "a", "n", "a", "n", "a"],
        ["a", "a", "a", "a", "a"],
        ["x", "y", "x", "y", "x", "y", "z"],
        ["q"],
        ["a", "b"],
    ]
    rng = random.Random(77)
    vocab = ["a", "b", "c"]
    cases += [
        [rng.choice(vocab) for _ in range(n)] for n in (20, 65)
    ]
    for toks in cases:
        assert _lcp(spark, toks) == py_lcp_adjacent(toks), toks


def test_duplicated_runs_detects_planted_run(spark):
    from kg_microbe_merge_spark.operators.suffix import duplicated_runs

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(50)]  # big vocab: no accidental runs
    run = ["the", "exact", "same", "eight", "token", "run", "appears", "twice"]
    toks = (
        [rng.choice(vocab) for _ in range(30)]
        + run
        + [rng.choice(vocab) for _ in range(25)]
        + run
        + [rng.choice(vocab) for _ in range(20)]
    )
    df = spark.createDataFrame(list(enumerate(toks)), "pos long, token string")
    hits = duplicated_runs(df, min_len=8).collect()
    assert len(hits) == 1
    (h,) = hits
    starts = {h["pos"], h["prev_pos"]}
    assert starts == {30, 30 + 8 + 25} and h["lcp"] == 8
    # python twin agrees everywhere
    assert _lcp(spark, toks) == py_lcp_adjacent(toks)
    # below-threshold: nothing at min_len=9
    assert duplicated_runs(df, min_len=9).count() == 0


def py_duplicated_coverage(docs, min_len):
    """docs: [(doc_id, text)] -> {doc_id: (n_tok, dup_tokens)}."""
    ordered = sorted(
        ((d, t.split()) for d, t in docs if t.split()),
        key=lambda x: (hash60_py(f"{x[0]}:sfx"), x[0]),
    )
    toks, owner = [], []  # owner[i] = (doc_id, doc_pos)
    for d, ts in ordered:
        for i, t in enumerate(ts):
            toks.append(t)
            owner.append((d, i))
    lcp = py_lcp_adjacent(toks)
    ivals = {}
    for _, (a, b, l) in lcp.items():
        if l >= min_len:
            for p in (a, b):
                d, dp = owner[p]
                ivals.setdefault(d, []).append((dp, dp + l))
    out = {}
    ntok = {d: len(ts) for d, ts in ordered}
    for d, n in ntok.items():
        acc, prev = 0, 0
        for s, e in sorted(ivals.get(d, [])):
            e = min(e, n)
            acc += max(0, e - max(s, prev))
            prev = max(prev, e)
        out[d] = (n, acc)
    return out


def test_duplicated_coverage(spark):
    from kg_microbe_merge_spark.operators.suffix import duplicated_coverage

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(60)]
    shared = "copy of this exact boilerplate sentence run".split()
    docs = [
        ("a", " ".join([rng.choice(vocab) for _ in range(15)] + shared)),
        ("b", " ".join(shared + [rng.choice(vocab) for _ in range(10)])),
        ("c", " ".join(rng.choice(vocab) for _ in range(12))),
        ("d", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["n_tok"], r["dup_tokens"], r["dup_frac"])
        for r in duplicated_coverage(df, min_len=4).collect()
    }
    want = py_duplicated_coverage(docs, min_len=4)
    assert set(got) == set(want)
    for d, (n, dup) in want.items():
        frac = math.floor(dup / n * 1e6 + 0.5) / 1e6 if n else 0.0
        assert got[d] == (n, dup, frac), d
    # the shared 7-token run is fully covered in both docs, absent in c
    assert got["a"][1] == 7 and got["b"][1] == 7 and got["c"][1] == 0


def test_longest_repeated_substring(spark):
    from kg_microbe_merge_spark.operators.suffix import (
        longest_repeated_substring,
    )

    toks = ["x", "a", "b", "c", "y", "a", "b", "c", "z"]
    df = spark.createDataFrame(list(enumerate(toks)), "pos long, token string")
    rows = longest_repeated_substring(df).collect()
    assert len(rows) == 1
    assert rows[0]["lcp"] == 3 and {rows[0]["pos"], rows[0]["prev_pos"]} == {1, 5}
    # no repeats at all -> empty
    uniq = spark.createDataFrame(
        list(enumerate(["a", "b", "c"])), "pos long, token string"
    )
    assert longest_repeated_substring(uniq).count() == 0
