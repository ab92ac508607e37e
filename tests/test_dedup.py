"""Dedup family: exact dedup semantics; MinHash-LSH and SimHash checked
against the exact n-gram-Jaccard oracle computed by the same engine
(recall on true near-dups, sanity on precision).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)


def _docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light"
    )
    rows = []
    # family 0: exact dups (whitespace/case variants normalize together)
    rows.append((0, base))
    rows.append((1, base.upper()))
    rows.append((2, "  " + base.replace(" ", "   ") + "  "))
    # family 1: near dup (one word changed)
    rows.append((3, base.replace("lazy", "sleepy")))
    # family 2: unrelated docs
    rows.append((4, "completely different content about spark shuffle "
                    "partitions and adaptive query execution plans today"))
    rows.append((5, "yet another unrelated document describing iceberg "
                    "table snapshots manifests and commit protocols"))
    # more near-dup families for recall stats
    for i in range(6, 26, 2):
        doc = f"document family {i} " + " ".join(
            f"tok{i}w{j}" for j in range(30)
        )
        rows.append((i, doc))
        rows.append((i + 1, doc.replace("w5", "w5x").replace("w17", "w17x")))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_groups(spark):
    out = dedup_exact(_docs(spark)).collect()
    by_id = {r["doc_id"]: r["dup_count"] for r in out}
    assert by_id[0] == 3          # docs 0,1,2 collapse to min id 0
    assert 1 not in by_id and 2 not in by_id
    assert by_id[3] == 1


def test_minhash_lsh_recall_vs_exact(spark):
    docs = _docs(spark)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.6, n=3).collect()
    }
    assert exact, "fixture must contain true near-dup pairs"
    approx = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            docs, threshold=0.5, num_hashes=128, bands=32, n=3
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} vs exact jaccard"


def test_simhash_flags_near_dups(spark):
    docs = _docs(spark)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dups(docs, max_hamming=12, n=2).collect()
    }
    # the one-word-changed pair must be caught
    assert (0, 3) in pairs or (3, 0) in pairs
    # unrelated docs must not be
    assert (4, 5) not in pairs and (5, 4) not in pairs


def test_shingle_plan_no_exchange(spark):
    """Shingle production must be row-local: the ONLY Exchange in the
    MinHash signature plan is the final (doc_id → K mins) groupBy, fed
    by a map-side partial agg — never a token-stream shuffle (no Window,
    no Exchange below the partial aggregate)."""
    from kg_microbe_merge_spark.operators.dedup import minhash_signatures

    docs = _docs(spark)
    plan = (
        minhash_signatures(docs, num_hashes=8, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan
    # tokenization stays in its own projection (CollapseProject barrier):
    # split appears at most once, never inlined per n-gram lambda element
    # (0 when ConvertToLocalRelation pre-evaluates the tiny local fixture)
    assert plan.count("split(") <= 1, plan


def test_portable_hash_matches_duckdb():
    """hash60 (Spark) / hash60_py / DuckDB hex-cast must agree exactly."""
    import duckdb

    from kg_microbe_merge_spark.functions.hashing import hash60_py, hash60_sql

    for s in ["hello", "", "a b c", "tok1 tok2 tok3", "123:7"]:
        duck = duckdb.sql(
            f"SELECT {hash60_sql('?')}".replace("?", f"'{s}'")
        ).fetchone()[0]
        assert hash60_py(s) == duck, s


def test_portable_hash_spark_side(spark):
    from pyspark.sql import functions as F

    from kg_microbe_merge_spark.functions.hashing import (
        hash60,
        hash60_py,
        hash60_seeded,
    )

    row = (
        spark.range(1)
        .select(
            hash60(F.lit("hello")).alias("h"),
            hash60_seeded(F.lit("hello"), 7).alias("hs"),
        )
        .first()
    )
    assert row["h"] == hash60_py("hello")
    assert row["hs"] == hash60_py("hello:7")


def test_embedding_near_dups_guard(spark):
    """The all-pairs baseline must refuse oversized inputs."""
    import pytest

    from kg_microbe_merge_spark.operators.dedup import embedding_near_dups
    from kg_microbe_merge_spark.operators.guards import TooLargeForBruteForce

    vecs = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    with pytest.raises(TooLargeForBruteForce):
        embedding_near_dups(vecs, max_rows=10)
    # bypass works
    assert embedding_near_dups(vecs, threshold=2.0, max_rows=None).count() == 0


def test_ngram_jaccard_values(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "v w x y z")],
        "doc_id long, text string",
    )
    out = ngram_jaccard_pairs(docs, threshold=0.5, n=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"], r["jaccard"]) == (1, 2, 1.0)


def test_candidate_dedup_exchange_carries_no_payload(spark):
    """The candidate-dedup distinct must shuffle (ids, scalar) ONLY —
    never the 64-slot signatures (minhash/simhash) or embeddings (LSH
    topk). At 100 TB the dedup exchange is the dominant shuffle of these
    operators; carrying a 64-long signature per candidate would move
    ~50x more bytes than the verified pair rows."""
    import re as _re

    from kg_microbe_merge_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_near_dups,
    )

    docs = _docs(spark)

    def dedup_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # hashpartitioning lines of exchanges feeding the final distinct
        return [
            m.group(0)
            for m in _re.finditer(r"hashpartitioning\([^)]*\)", plan)
            if "doc_a" in m.group(0)
        ]

    ex = dedup_exchanges(minhash_lsh_pairs(docs, threshold=0.5, num_hashes=8, bands=4))
    assert ex, "expected a candidate-dedup exchange"
    for e in ex:
        assert "sig_a" not in e and "sig_b" not in e, e
        assert "est_jaccard" in e, e

    ex = dedup_exchanges(simhash_near_dups(docs, max_hamming=6))
    assert ex, "expected a candidate-dedup exchange"
    for e in ex:
        assert "sh_a" not in e and "sh_b" not in e, e
        assert "hamming" in e, e


def test_near_dup_clusters_transitive_chain(spark):
    """A~B and B~C (A≁C directly) must land in ONE cluster with ONE
    survivor — the decision greedy pairwise dropping gets wrong."""
    from kg_microbe_merge_spark.operators.dedup import (
        drop_near_duplicates,
        near_dup_clusters,
    )

    base = " ".join(f"w{j}" for j in range(40))
    rows = [
        (1, base),
        (2, base.replace("w3", "w3x")),            # ~ doc 1
        (3, base.replace("w3", "w3x").replace("w30", "w30x")),  # ~ doc 2
        (9, "completely unrelated text about spark adaptive execution "
            "plans and shuffle partition coalescing strategies"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    clusters = near_dup_clusters(docs, threshold=0.5, num_hashes=32, bands=16, n=3)
    got = {r["doc_id"]: (r["canonical_id"], r["kept"]) for r in clusters.collect()}
    assert got.keys() == {1, 2, 3}  # singleton 9 absent
    assert all(c == 1 for c, _ in got.values()), got
    assert got[1][1] is True and got[2][1] is False and got[3][1] is False

    kept = drop_near_duplicates(docs, threshold=0.5, num_hashes=32, bands=16, n=3)
    assert {r["doc_id"] for r in kept.collect()} == {1, 9}


def test_benchmark_contamination_counts(spark):
    """Hand-checkable fixture: doc t1 shares its full shingle set with
    benchmark doc b1, t2 shares exactly one 3-gram, t3 shares none.
    Counts are exact integers (distinct 3-gram shingles per doc)."""
    from kg_microbe_merge_spark.operators.dedup import benchmark_contamination

    train = spark.createDataFrame(
        [("t1", "alpha beta gamma delta"),
         ("t2", "zz yy alpha beta gamma qq rr"),
         ("t3", "one two three four five")],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame(
        [("b1", "alpha beta gamma delta")], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in benchmark_contamination(train, bench, n=3).collect()
    }
    # t1: shingles {abc, bcd} (2), both in bench; t2: 5 shingles, only
    # 'alpha beta gamma' shared; t3: 3 shingles, none shared
    assert got["t1"] == (2, 2)
    assert got["t2"] == (5, 1)
    assert got["t3"] == (3, 0)


def test_deterministic_complement_partitions(spark):
    """sample + complement = exact disjoint exhaustive partition."""
    from kg_microbe_merge_spark.operators.split import (
        deterministic_complement,
        deterministic_sample,
    )

    df = spark.range(500).select(F.col("id").cast("string").alias("doc_id"))
    s = set(r["doc_id"] for r in
            deterministic_sample(df, 0.3, id_col="doc_id").collect())
    c = set(r["doc_id"] for r in
            deterministic_complement(df, 0.3, id_col="doc_id").collect())
    assert s.isdisjoint(c)
    assert len(s) + len(c) == 500


def test_duplicated_span_stats_values(spark):
    """Span-level dup detection: doc-frequency over distinct per-doc
    n-gram spans, hand-checkable on 3-token spans."""
    from kg_microbe_merge_spark.operators.dedup import duplicated_span_stats

    docs = spark.createDataFrame(
        [
            # d1/d2 share the span "alpha beta gamma"; d1's second span
            # "beta gamma delta" is unique to it
            ("d1", "alpha beta gamma delta"),
            ("d2", "alpha beta gamma"),
            # d3 shares nothing
            ("d3", "epsilon zeta eta theta"),
            # d4 duplicates d3's FIRST span only
            ("d4", "epsilon zeta eta"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_fraction"])
        for r in duplicated_span_stats(docs, n=3, min_df=2).collect()
    }
    assert got["d1"] == (2, 1, 0.5)
    assert got["d2"] == (1, 1, 1.0)
    assert got["d3"] == (2, 1, 0.5)
    assert got["d4"] == (1, 1, 1.0)


def test_duplicated_span_within_doc_repeat_not_counted(spark):
    """A span repeated WITHIN one document is not corpus-duplicated:
    postings are distinct per doc, so df counts distinct documents."""
    from kg_microbe_merge_spark.operators.dedup import duplicated_span_stats

    docs = spark.createDataFrame(
        [("d1", "a b c a b c a b c"), ("d2", "x y z w v u")],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r["n_dup_spans"]
        for r in duplicated_span_stats(docs, n=3, min_df=2).collect()
    }
    assert got["d1"] == 0
    assert got["d2"] == 0


def test_remove_duplicated_spans_cuts_shared_run(spark):
    # docs 1 and 2 share a 9-token run; with n=5 every window inside it
    # is flagged and the whole run disappears from BOTH documents,
    # while the unique doc is untouched and identical short docs (one
    # whole-doc span each) vanish entirely
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog and runs away fast today"),
            (2, "Some intro text then the quick brown fox jumps over the lazy dog here"),
            (3, "totally unique content with no shared spans at all in this one row"),
            (4, "short doc"),
            (5, "short doc"),
        ],
        "doc_id long, text string",
    )
    from kg_microbe_merge_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    out = {
        r.doc_id: r
        for r in remove_duplicated_spans(docs, n=5, min_df=2).collect()
    }
    assert out[1].clean_text == "and runs away fast today"
    assert out[2].clean_text == "some intro text then here"
    assert (out[1].n_tokens, out[1].n_removed) == (14, 9)
    assert "quick brown fox" not in out[2].clean_text
    assert out[3].clean_text.startswith("totally unique")
    assert out[3].n_removed == 0
    assert out[4].clean_text == "" and out[4].n_removed == 2
    assert out[5].clean_text == ""
    # count invariant: kept tokens + removed tokens = all tokens
    for r in out.values():
        kept = len(r.clean_text.split()) if r.clean_text else 0
        assert kept + r.n_removed == r.n_tokens


def test_remove_duplicated_spans_unique_corpus_unchanged(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} says alpha{i} beta{i} gamma{i} delta{i} eps{i}")
         for i in range(20)],
        "doc_id long, text string",
    )
    from kg_microbe_merge_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    out = remove_duplicated_spans(docs, n=5, min_df=2)
    assert out.filter("n_removed > 0").count() == 0
    # clean text equals the normalized original
    bad = out.join(
        docs.select(
            "doc_id",
            F.trim(
                F.regexp_replace(F.lower("text"), r"\s+", " ")
            ).alias("norm"),
        ),
        "doc_id",
    ).filter("clean_text != norm")
    assert bad.count() == 0


def test_positional_span_postings_positions(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    from kg_microbe_merge_spark.operators.dedup import (
        positional_span_postings,
    )

    rows = positional_span_postings(docs, 4).collect()
    # 6 tokens, n=4 -> starts 0,1,2
    assert sorted(r.pos for r in rows) == [0, 1, 2]
    # spans are the portable hash60 of the joined grams
    from kg_microbe_merge_spark.functions.hashing import hash60_py

    by_pos = {r.pos: r.span for r in rows}
    assert by_pos[0] == hash60_py("a b c d")
    assert by_pos[2] == hash60_py("c d e f")


def test_remove_duplicated_spans_fixpoint(spark):
    # single pass leaves residual duplication: d1/d2 shrink onto the
    # SAME residue ("alpha beta gamma delta") and d3/d4 onto "x y" —
    # new duplicates formed BY the cut; the fixpoint clears them
    docs = spark.createDataFrame(
        [
            (1, "alpha beta GONE1 GONE2 GONE3 gamma delta"),
            (2, "alpha beta GONE4 GONE5 GONE6 gamma delta"),
            (3, "x GONE1 GONE2 GONE3 y"),
            (4, "x GONE4 GONE5 GONE6 y"),
        ],
        "doc_id long, text string",
    )
    from kg_microbe_merge_spark.operators.dedup import (
        remove_duplicated_spans,
        remove_duplicated_spans_to_fixpoint,
    )

    single = {
        r.doc_id: r for r in remove_duplicated_spans(docs, n=3).collect()
    }
    assert single[1].clean_text == "alpha beta gamma delta"  # new dup!
    assert single[2].clean_text == "alpha beta gamma delta"
    fixed = {
        r.doc_id: r
        for r in remove_duplicated_spans_to_fixpoint(docs, n=3).collect()
    }
    # every doc collapsed to duplicated residue -> everything removed
    for i in (1, 2, 3, 4):
        assert fixed[i].clean_text == "", fixed[i]
        assert fixed[i].n_removed == fixed[i].n_tokens
    # n_tokens reports ORIGINAL counts
    assert fixed[1].n_tokens == 7 and fixed[3].n_tokens == 5
    # a corpus with no duplication is a fixpoint after one round
    uniq = spark.createDataFrame(
        [(i, f"only{i} ever{i} here{i} now{i}") for i in range(6)],
        "doc_id long, text string",
    )
    out = remove_duplicated_spans_to_fixpoint(uniq, n=3)
    assert out.filter("n_removed > 0").count() == 0
