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


#: whole-anchor matches for (href, text) pairs — same double-quoted
#: subset as HREF_RE; inner text without nested tags (nested-markup
#: anchors are edge-extraction noise, not corruption)
ANCHOR_RE = r'<a\s[^>]*href="[^"]*"[^>]*>[^<]*</a>'


def extract_anchors(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """One row per anchor: ``(src_url, href, anchor_text)``.

    Whole ``<a ...>text</a>`` matches are pulled with ONE JVM-side
    ``regexp_extract_all`` + explode, then href/text are re-extracted
    per element row-locally — still zero Python, one codegen stage,
    one scan (``regexp_extract_all`` returns a single group, so
    two-field extraction needs the per-element pass).
    """
    html_str = F.decode(F.col(html_col), "UTF-8")
    a = F.explode(
        F.regexp_extract_all(html_str, F.lit(ANCHOR_RE), F.lit(0))
    ).alias("a")
    return (
        df.select(F.col(url_col).alias("src_url"), a)
        .select(
            "src_url",
            F.regexp_extract(F.col("a"), r'href="([^"]*)"', 1).alias(
                "href"
            ),
            F.regexp_extract(F.col("a"), r">([^<]*)</a>", 1).alias(
                "anchor_text"
            ),
        )
    )


def anchor_alias_dict(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_count: int = 2,
    min_len: int = 2,
    max_len: int = 64,
) -> DataFrame:
    """Induce an entity-linking alias dictionary from anchor text —
    the web-scale bootstrap for ``functions/linking.py``'s broadcast
    dictionary (the CrossWikis/Wikipedia-anchor recipe: how the web
    NAMES a page is the best surface-form inventory for linking to
    it).

    Aliases are whitespace-normalized, lowercased anchor texts of
    length [min_len, max_len]; each (alias, target-href) pair seen at
    least ``min_count`` times becomes a dictionary row::

        (alias, entity_id, prior, n_links, alias_total)

    ``prior`` is the exact-integer micro commonness
    (1_000_000 * n + total div 2) div total — P(entity | alias) in
    micro units, directly usable by ``resolve_alias_dictionary`` /
    ``link_mentions`` (max-prior resolution only needs monotone
    scores; BIGINT keeps both engines bit-identical).

    Shuffle shape: one pair-count aggregation (map-side combinable —
    the Zipf head of repeated (alias, target) anchors collapses before
    the exchange) + one alias-partition window over the already
    dictionary-sized counts. The html column never crosses a shuffle.
    """
    counts = anchor_pair_counts(
        df, html_col=html_col, url_col=url_col,
        min_len=min_len, max_len=max_len,
    )
    return finalize_alias_dict(counts, min_count=min_count)


def anchor_pair_counts(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_len: int = 2,
    max_len: int = 64,
) -> DataFrame:
    """The mergeable half of :func:`anchor_alias_dict`:
    ``(alias, entity_id, n_links)`` pair counts with no min_count /
    prior applied. Counts are SUM-mergeable across crawl slices, which
    is what lets ``streaming/maintain.fold_alias_batch`` maintain the
    dictionary continuously — union + groupBy-sum of two slices'
    counts equals the counts of the union."""
    pairs = extract_anchors(df, html_col=html_col, url_col=url_col)
    alias = F.lower(
        F.regexp_replace(F.trim(F.col("anchor_text")), r"\s+", " ")
    )
    return (
        pairs.select(alias.alias("alias"), F.col("href").alias("entity_id"))
        .filter(
            (F.length("alias") >= min_len) & (F.length("alias") <= max_len)
        )
        .groupBy("alias", "entity_id")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def finalize_alias_dict(counts: DataFrame, min_count: int = 2) -> DataFrame:
    """Presentation half: min_count gate + alias totals + the
    exact-integer micro prior over a pair-count relation (from
    :func:`anchor_pair_counts` or the streaming snapshot store)."""
    from pyspark.sql import Window

    counts = counts.filter(F.col("n_links") >= min_count)
    w = Window.partitionBy("alias")
    return counts.select(
        "alias",
        "entity_id",
        "n_links",
        F.sum("n_links").over(w).alias("alias_total"),
    ).select(
        "alias",
        "entity_id",
        F.expr(
            "(1000000 * n_links + alias_total div 2) div alias_total"
        ).cast("bigint").alias("prior"),
        "n_links",
        "alias_total",
    )
