"""JVM (whole-stage-codegen) extraction twin vs the Arrow-UDF reference.

The twin (functions/extract.jvm_extract_text + functions/triples.
triples_from_corpus_jvm) is only ever evaluated on rows inside the
whitelisted plain-tag class; everything else must route to the Python
reference path. These tests prove (a) byte-identity of JVM text with
extract_text_py over the corpus, (b) row-identity of the full JVM-twin
triple pipeline with the fused Arrow pipeline, (c) the eligibility
filter rejects exactly the constructs whose semantics the regex twin
does not model, and the end-to-end result STILL matches the pure-Python
reference on those documents (fallback routing), (d) the plan for the
eligible side contains no Python evaluation node.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.extract import (
    extract_text_py,
    jvm_extract_eligible,
    jvm_extract_text,
)
from kg_microbe_merge_spark.functions.triples import (
    extract_triples_py,
    triples_from_corpus,
    triples_from_corpus_jvm,
)
from kg_microbe_merge_spark.sources.corpus import generate_corpus

N_DOCS = 4000


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_corpus(spark, N_DOCS, seed=42, partitions=8).cache()


def test_corpus_fully_eligible_and_text_byte_identical(spark, corpus):
    rows = (
        corpus.select(
            "html",
            jvm_extract_eligible(F.col("html")).alias("e"),
            jvm_extract_text(F.col("html")).alias("jt"),
        )
    ).collect()
    assert len(rows) == N_DOCS
    for r in rows:
        assert r.e is True
        assert r.jt == extract_text_py(bytes(r.html))


def test_jvm_twin_rows_identical_to_fused(spark, corpus):
    a = triples_from_corpus(corpus)
    b = triples_from_corpus_jvm(corpus)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == b.count() > 0


# Constructs OUTSIDE the plain-tag class: each must be ineligible, and
# the full twin pipeline must still equal the single-threaded reference
# because the row falls back to the Arrow path.
_ADVERSARIAL = [
    b"<html><body><p>A <!-- comment --> B produces C.</p></body></html>",
    b"<html><body><p>A&amp;B Alpha produces Beta.</p></body></html>",
    b"<?xml version='1.0'?><p>Alpha produces Beta.</p>",
    b"<!DOCTYPE html><p>Alpha produces Beta.</p>",
    b"<p>Alpha binds Beta.</p></<p>bogus",
    b'<p title="a>b">Alpha binds Beta.</p>',
    b"<nav><nav>deep</nav>Alpha binds Beta.</nav><p>Gamma binds Delta.</p>",
    b"<nav>unclosed <p>Alpha binds Beta.</p>",
    b"<script>a < b</script><p>Alpha binds Beta.</p>",  # '<' in CDATA
    b"< p>odd tag</ p><p>Alpha binds Beta.</p>",
    b"<p class='single'>Alpha binds Beta.</p>",
    b"\xff\xfe<p>Alpha binds Beta.</p>",  # invalid utf-8
]

# IN-class edge cases that look risky but are provably identical under
# the twin (e.g. a script element whose body has no '<' '>' '&': the
# class regex sees balanced tags and the non-greedy element removal
# lands on the same `</script>` the parser's CDATA scan finds).
_EDGE_ELIGIBLE = [
    b"<script>if (a) go();</script><p>Alpha binds Beta.</p>",
    b"<SCRIPT>x = 1;</SCRIPT><P>Alpha binds Beta.</P>",  # case-insensitive
    b"<p>Alpha\n\t  binds \xc2\xa0 Beta.</p>",  # unicode \s collapse
    b"<article><p>Alpha binds Beta.</p><p></p></article>",  # empty block
]


def _mk_corpus(spark, htmls):
    pdf = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(len(htmls))],
            "warc_ts": pd.to_datetime([1700000000 + i for i in range(len(htmls))], unit="s"),
            "html": htmls,
            "text": pd.Series([None] * len(htmls), dtype=object),
            "lang": ["en"] * len(htmls),
        }
    )
    return spark.createDataFrame(
        pdf,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def test_adversarial_docs_ineligible_but_twin_still_exact(spark):
    df = _mk_corpus(spark, _ADVERSARIAL)
    elig = df.select(jvm_extract_eligible(F.col("html")).alias("e")).collect()
    assert all(r.e is False for r in elig), [r.e for r in elig]

    got = sorted(
        (r.url, r.subj, r.pred, r.obj)
        for r in triples_from_corpus_jvm(df).collect()
    )
    want = []
    for i, h in enumerate(_ADVERSARIAL):
        for s, p, o, _ in extract_triples_py(extract_text_py(h)):
            want.append((f"u{i}", s, p, o))
    assert got == sorted(want)
    assert len(want) > 0  # the adversarial set itself must assert triples


def test_edge_eligible_docs_byte_identical(spark):
    df = _mk_corpus(spark, _EDGE_ELIGIBLE)
    rows = df.select(
        "url",
        "html",
        jvm_extract_eligible(F.col("html")).alias("e"),
        jvm_extract_text(F.col("html")).alias("jt"),
    ).collect()
    for r in rows:
        assert r.e is True, r.url
        assert r.jt == extract_text_py(bytes(r.html)), r.url


def test_prepopulated_text_routes_to_python_path(spark):
    # rows carrying text must keep it (input contract) even when the
    # html alone would be eligible — the twin must not re-extract
    htmls = [b"<p>Alpha binds Beta.</p>"]
    df = _mk_corpus(spark, htmls).withColumn(
        "text", F.lit("Gamma produces Delta.")
    )
    rows = triples_from_corpus_jvm(df).collect()
    assert [(r.subj, r.pred, r.obj) for r in rows] == [
        ("Gamma", "produces", "Delta")
    ]


def test_fuzzed_docs_end_to_end_exact(spark):
    # deterministic grammar fuzzer mixing in-class and out-of-class
    # tokens; one Spark pass. For every doc: if eligible, JVM text must
    # be byte-identical; either way the full twin pipeline must equal
    # the pure-Python reference (fallback routing).
    import random

    rng = random.Random(20260821)
    toks = [
        "<p>", "</p>", "<div>", "</div>", "<nav>", "</nav>", "<script>",
        "</script>", "<li>", "</li>", "<span>", "</span>", "<b>", "</b>",
        "Alpha binds Beta. ", "Gamma produces Delta. ", "plain text ",
        "the a of ", "<!-- c -->", "&amp;", "&", "<", ">", "</ p>",
        '<a href="https://x.example/">L</a>', "<p/>", "<P>", "</P>",
        "\n", "\t", "\xa0", "Entity_0001 inhibits Entity_0002. ",
    ]
    docs = [
        "".join(rng.choice(toks) for _ in range(rng.randint(1, 30))).encode()
        for _ in range(300)
    ]
    df = _mk_corpus(spark, docs)
    rows = df.select(
        "url",
        jvm_extract_eligible(F.col("html")).alias("e"),
        F.when(
            jvm_extract_eligible(F.col("html")),
            jvm_extract_text(F.col("html")),
        ).alias("jt"),
    ).collect()
    n_elig = 0
    for r in rows:
        i = int(r.url[1:])
        if r.e:
            n_elig += 1
            assert r.jt == extract_text_py(docs[i]), (r.url, docs[i])
    # the fuzz grammar must exercise BOTH routes
    assert 0 < n_elig < len(docs)

    got = sorted(
        (r.url, r.subj, r.pred, r.obj)
        for r in triples_from_corpus_jvm(df).collect()
    )
    want = sorted(
        (f"u{i}", s, p, o)
        for i, h in enumerate(docs)
        for s, p, o, _ in extract_triples_py(extract_text_py(h))
    )
    assert got == want
    assert len(want) > 0


def test_eligible_plan_has_no_python_node(spark, corpus, tmp_path):
    # materialize to parquet first: the in-memory corpus generator is
    # itself a MapInPandas source, which would mask the assertion
    path = str(tmp_path / "corpus")
    corpus.write.mode("overwrite").parquet(path)
    on_disk = spark.read.parquet(path)

    eligible_branch = on_disk.filter(
        jvm_extract_eligible(F.col("html"))
    ).select(jvm_extract_text(F.col("html")).alias("t"))
    plan = eligible_branch._jdf.queryExecution().executedPlan().toString()
    # no Python evaluation node anywhere (higher-order array exprs keep
    # the stage out of WholeStageCodegen, but it is still all JVM)
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    # and the fallback side of the union is empty on the clean corpus
    n_union = triples_from_corpus_jvm(on_disk).count()
    n_fused = triples_from_corpus(on_disk).count()
    assert n_union == n_fused
