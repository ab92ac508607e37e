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


# --- anchor text + alias-dictionary induction ------------------------


def _pages(spark):
    rows = [
        ("u1", '<p>x</p><a href="https://acme.example/">Acme Corp</a>'
               '<a href="https://acme.example/">ACME  corp</a>'),
        ("u2", '<a href="https://acme.example/">acme corp</a>'
               '<a href="https://other.example/">Acme Corp</a>'),
        ("u3", '<a href="https://acme.example/">acme corp</a>'
               '<a class="x" href="https://other.example/">z</a>'
               '<a href="https://other.example/"></a>'),
        ("u4", "<p>no anchors here</p>"),
    ]
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary"
    )


def test_extract_anchors_href_and_text(spark):
    from kg_microbe_merge_spark.functions.links import extract_anchors

    got = {
        (r["src_url"], r["href"], r["anchor_text"])
        for r in extract_anchors(_pages(spark)).collect()
    }
    assert ("u1", "https://acme.example/", "Acme Corp") in got
    assert ("u3", "https://other.example/", "z") in got
    assert ("u3", "https://other.example/", "") in got
    assert not any(u == "u4" for u, _, _ in got)
    assert len(got) == 7


def test_anchor_alias_dict_counts_and_prior(spark):
    from kg_microbe_merge_spark.functions.links import anchor_alias_dict

    out = anchor_alias_dict(_pages(spark), min_count=1).collect()
    rows = {(r["alias"], r["entity_id"]):
            (r["prior"], r["n_links"], r["alias_total"]) for r in out}
    # "acme corp" (5× after normalization): 4× acme.example, 1× other
    assert rows[("acme corp", "https://acme.example/")] == (800_000, 4, 5)
    assert rows[("acme corp", "https://other.example/")] == (200_000, 1, 5)
    # 1-char alias "z" and empty text filtered by min_len
    assert not any(a == "z" or a == "" for a, _ in rows)
    # min_count=2 keeps only the dominant pair
    out2 = anchor_alias_dict(_pages(spark), min_count=2).collect()
    assert [(r["alias"], r["entity_id"], r["prior"]) for r in out2] == [
        ("acme corp", "https://acme.example/", 1_000_000)
    ]


def test_alias_dict_feeds_link_mentions(spark):
    from kg_microbe_merge_spark.functions.linking import link_mentions
    from kg_microbe_merge_spark.functions.links import anchor_alias_dict

    aliases = anchor_alias_dict(_pages(spark), min_count=1)
    triples = spark.createDataFrame(
        [("acme corp", "makes", "widgets")],
        "subj string, pred string, obj string",
    )
    out = link_mentions(triples, aliases).collect()
    assert len(out) == 1
    # ambiguous alias resolves to max-prior entity (the 800k one); the
    # linked id replaces the surface form in place
    assert out[0]["subj"] == "https://acme.example/"
    assert out[0]["subj_score"] == 800_000
    assert out[0]["obj"] == "surface:widgets"


def test_corpus_anchor_aliases_point_at_their_hosts(spark):
    from kg_microbe_merge_spark.functions.links import anchor_alias_dict
    from kg_microbe_merge_spark.sources.corpus import generate_corpus

    d = anchor_alias_dict(generate_corpus(spark, 300, seed=42),
                          min_count=2).collect()
    assert d
    for r in d:
        # "hub 03 portal" → hub03.example; "site 123" → site123.example
        host_digits = "".join(ch for ch in r["entity_id"] if ch.isdigit())
        alias_digits = "".join(ch for ch in r["alias"] if ch.isdigit())
        assert alias_digits == host_digits
        assert r["prior"] == 1_000_000  # derived text is unambiguous
