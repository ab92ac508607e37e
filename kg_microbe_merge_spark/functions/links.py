"""Web link-graph extraction from crawl HTML.

The web-KG analogue of the reference's edge tables: anchors in crawled
pages ARE the edges of the web graph, and host-level authority over
that graph is the standard Common-Crawl-style quality prior (used to
weight corpus curation exactly like per-domain quality priors in
``functions/urls.py``). The reference has no crawl surface; this module
extends the north-star pipeline (corpus → extract → triples → KG) with
the link half of the crawl.

Scale design: href extraction is a single JVM-side
``regexp_extract_all`` + ``explode`` over the html column — zero
Python, whole-stage codegen, one scan. The host rollup is one
partially-aggregable groupBy on (src_host, dst_host): the shuffle
carries host-pair counts, never the html payload or the raw link list.
At 10^12 documents the host graph is ~10^8 rows — small enough that
the downstream pagerank's per-iteration shuffles operate on the
ROLLUP, not the crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import url_host

#: double-quoted href attributes — the deliberate subset: the synthetic
#: corpus (and the vast majority of real crawl HTML) double-quotes;
#: single-quoted/unquoted attrs would need the tolerant tag grammar in
#: functions/extract.py, which is overkill for edge EXTRACTION where a
#: missed malformed anchor is noise, not corruption.
HREF_RE = r'href="([^"]+)"'


def extract_links(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """One row per (src_url, href) anchor target in the page.

    ``html_col`` is the crawl's binary column (input_hint schema);
    decode + regex + explode all run JVM-side in one codegen stage.
    Pages with no anchors emit no rows.
    """
    html_str = F.decode(F.col(html_col), "UTF-8")
    return df.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.regexp_extract_all(html_str, F.lit(HREF_RE), F.lit(1))
        ).alias("href"),
    )


def host_link_graph(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Host-level link rollup ``(src_host, dst_host, n_links)``.

    Relative hrefs (no parseable host) are dropped — they never leave
    the host, and host-graph consumers (authority, blocklist spill)
    only care about cross-host endorsement. Self-edges are KEPT (intra-
    host navigation is real signal; drop downstream if unwanted).
    """
    links = extract_links(df, html_col=html_col, url_col=url_col)
    return (
        links.select(
            url_host(F.col("src_url")).alias("src_host"),
            url_host(F.col("href")).alias("dst_host"),
        )
        .filter(F.col("dst_host") != "")
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def host_authority(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the host link graph → ``(host, rank)``.

    Each anchor is one endorsement: the rollup's ``n_links`` is passed
    as pagerank's edge weight, which is mathematically the
    parallel-edge expansion without materializing it — every pagerank
    iteration shuffles the host-PAIR relation, never the anchor list.
    """
    from ..operators.pagerank import pagerank

    g = host_link_graph(df, html_col=html_col, url_col=url_col)
    return pagerank(
        g,
        src="src_host",
        dst="dst_host",
        weight="n_links",
        iterations=iterations,
        damping=damping,
    ).withColumnRenamed("node", "host")
