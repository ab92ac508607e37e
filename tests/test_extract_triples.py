"""Extraction + triple P/R gates (BASELINE targets):

- per-url BYTE-IDENTICAL extracted text: distributed pandas-UDF path vs
  the single-threaded pure-python reference implementation;
- triple precision/recall ≥ 0.95 vs the generator's ground truth
  (deterministic corpus ⇒ exact oracle);
- determinism across independent runs (Spark may re-execute tasks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.extract import (
    extract_text_py,
    with_extracted_text,
)
from kg_microbe_merge_spark.functions.triples import (
    extract_triples_py,
    with_triples,
)
from kg_microbe_merge_spark.sources.corpus import (
    gen_doc,
    generate_corpus,
    ground_truth_triples,
)

N_DOCS = 400


def test_extract_byte_identity(spark):
    corpus = generate_corpus(spark, N_DOCS, seed=42)
    got = {
        r["url"]: r["text"]
        for r in with_extracted_text(corpus).select("url", "text").collect()
    }
    assert len(got) == N_DOCS
    for i in range(N_DOCS):
        d = gen_doc(42, i)
        expected = extract_text_py(d["html"])
        assert got[d["url"]] == expected, f"doc {i} text differs"
        # byte-level: encodes identically
        assert got[d["url"]].encode("utf-8") == expected.encode("utf-8")


def test_extract_null_and_empty(spark):
    df = spark.createDataFrame(
        [("u1", None), ("u2", b"<html><body></body></html>"),
         ("u3", b"<p>hi</p>")],
        "url string, html binary",
    )
    rows = {r["url"]: r["text"] for r in with_extracted_text(df).collect()}
    assert rows["u1"] is None          # null html -> null text
    assert rows["u2"] == ""            # content-free html -> empty string
    assert rows["u3"] == "hi"


def test_extract_prefers_existing_text(spark):
    df = spark.createDataFrame(
        [("u1", b"<p>from html</p>", "pre-extracted"),
         ("u2", b"<p>from html</p>", None)],
        "url string, html binary, text string",
    )
    rows = {r["url"]: r["text"] for r in with_extracted_text(df).collect()}
    assert rows["u1"] == "pre-extracted"
    assert rows["u2"] == "from html"


def test_triple_precision_recall(spark):
    corpus = generate_corpus(spark, N_DOCS, seed=42)
    extracted = with_extracted_text(corpus).filter(F.col("lang") == "en")
    got = with_triples(extracted.select("url", "text")).select(
        "url", "subj", "pred", "obj"
    )
    truth = ground_truth_triples(spark, N_DOCS, seed=42)
    got_set = {tuple(r) for r in got.collect()}
    truth_set = {tuple(r) for r in truth.collect()}
    assert truth_set, "ground truth must be non-empty"
    tp = len(got_set & truth_set)
    precision = tp / len(got_set)
    recall = tp / len(truth_set)
    assert precision >= 0.95, f"precision {precision:.3f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95"


def test_triples_deterministic_and_pure(spark):
    # pure python and UDF paths agree document-by-document
    for i in (0, 1, 5, 9):
        d = gen_doc(42, i)
        text = extract_text_py(d["html"])
        triples = [(s, p, o) for (s, p, o, _c) in extract_triples_py(text)]
        if d["lang"] == "en":
            assert set(triples) == set(d["truths"]), f"doc {i}"
        else:
            assert triples == []


def test_fused_triples_equal_unfused_path(spark):
    """triples_from_corpus (one mapInPandas hop) must equal the
    two-UDF path exactly — same rows, same multiplicities."""
    from kg_microbe_merge_spark.functions.triples import (
        triples_from_corpus,
        with_triples,
    )

    corpus = generate_corpus(spark, 400, seed=42)
    unfused = (
        with_triples(
            with_extracted_text(corpus)
            .filter(F.col("lang") == "en")
            .select("url", "text")
        )
        .select("url", "subj", "pred", "obj", "conf")
    )
    fused = triples_from_corpus(corpus)
    a = sorted(map(tuple, unfused.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b and a


def test_fused_triples_plan_shape(spark, tmp_path):
    """ONE Python hop over a parquet corpus; the language filter is
    pushed into the scan, so non-en html is never decoded or
    transferred across Arrow."""
    from kg_microbe_merge_spark.functions.triples import triples_from_corpus

    path = str(tmp_path / "corpus")
    generate_corpus(spark, 50, seed=1).write.parquet(path)
    plan = (
        triples_from_corpus(spark.read.parquet(path))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: warc_ts never read
    assert "warc_ts" not in plan.split("ReadSchema")[1]


def test_fused_triples_keeps_preextracted_text(spark):
    """Rows with non-null text skip html extraction (input contract
    parity with with_extracted_text)."""
    from kg_microbe_merge_spark.functions.triples import triples_from_corpus

    df = spark.createDataFrame(
        [
            ("u1", None, "Alpha produces Beta", "en"),
            ("u2", b"<html><body><p>Gamma inhibits Delta and more words here</p></body></html>", None, "en"),
            ("u3", None, "Epsilon binds Zeta", "de"),
        ],
        "url string, html binary, text string, lang string",
    )
    rows = {
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in triples_from_corpus(df).collect()
    }
    assert ("u1", "Alpha", "produces", "Beta") in rows
    assert ("u2", "Gamma", "inhibits", "Delta") in rows
    assert not any(u == "u3" for u, *_ in rows)
