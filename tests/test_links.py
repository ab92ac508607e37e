"""Link-graph extraction (functions/links.py): hrefs vs a pure-Python
regex oracle over the deterministic corpus, host-rollup counts, the
weighted-pagerank ≡ parallel-edge-expansion equivalence, and the
boilerplate guarantee that anchors never leak into extracted text."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.links import (
    HREF_RE,
    extract_links,
    host_authority,
    host_link_graph,
)
from kg_microbe_merge_spark.operators.pagerank import pagerank
from kg_microbe_merge_spark.sources.corpus import gen_doc, generate_corpus

N = 300


def _py_links():
    out = []
    for i in range(N):
        d = gen_doc(42, i)
        for href in re.findall(HREF_RE, d["html"].decode("utf-8")):
            out.append((d["url"], href))
    return out


def test_extract_links_matches_python_oracle(spark):
    got = sorted(
        (r["src_url"], r["href"])
        for r in extract_links(generate_corpus(spark, N, seed=42)).collect()
    )
    want = sorted(_py_links())
    assert got == want
    assert len(want) >= N  # every doc carries at least one outlink


def test_host_link_graph_counts(spark):
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_graph(generate_corpus(spark, N, seed=42)).collect()
    }
    c = Counter()
    for _, href in _py_links():
        host = re.match(r"https?://([^/?#]+)", href).group(1).lower()
        c[("synthetic.example", host)] += 1
    assert got == dict(c)


def test_host_authority_weighted_equals_expansion(spark):
    corpus = generate_corpus(spark, N, seed=42)
    g = host_link_graph(corpus)
    expanded = g.select(
        "src_host",
        "dst_host",
        F.explode(F.sequence(F.lit(1), F.col("n_links"))).alias("_i"),
    ).select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    want = {r["node"]: r["rank"] for r in pagerank(expanded).collect()}
    got = {r["host"]: r["rank"] for r in host_authority(corpus).collect()}
    assert got.keys() == want.keys()
    assert all(abs(got[k] - want[k]) <= 2e-6 for k in want)
    # Zipf-skewed targets: the global top host must be a hub site
    assert max(got, key=got.get).startswith("hub")


def test_weighted_pagerank_unweighted_case_unchanged(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c")],
        "src string, dst string",
    )
    base = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    rolled = edges.groupBy("src", "dst").count()
    wtd = {
        r["node"]: r["rank"] for r in pagerank(rolled, weight="count").collect()
    }
    assert base == wtd


def test_anchors_never_leak_into_extracted_text(spark):
    from kg_microbe_merge_spark.functions.extract import with_extracted_text

    corpus = generate_corpus(spark, 60, seed=42)
    texts = [
        r["text"] for r in with_extracted_text(corpus).select("text").collect()
    ]
    assert texts and all(t for t in texts)
    # anchors live in the <footer> boilerplate the extractor drops: no
    # target host or href markup may surface in any extracted text
    joined = "\n".join(texts)
    assert ".example/" not in joined
    assert "href" not in joined
