"""URL parsing + per-domain corpus analytics (web-curation stage).

Common-Crawl-style pipelines group, filter, and rate-limit by registered
domain: blocklists, per-domain quality priors, per-host dedup budgets.
This module provides the column functions — host, registered domain,
path depth, query-parameter extraction — as JVM-side expressions
(``parse_url`` is a native Spark SQL function; the regex fallbacks are
RE2-safe so the DuckDB oracle can run the identical patterns), plus the
standard per-domain rollup.

Everything is whole-stage codegen; the only exchange in the rollup is
the one ``groupBy(domain)`` aggregation (map-side partial), which is
the minimum any per-domain statistic needs. At 100 TB the domain key is
Zipf-skewed (a handful of hosts dominate the crawl) — the rollup
aggregates metrics only (counts/sums, partially aggregable), never
collects per-domain row lists, so hub domains cost one combiner cell
per map task, not memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe and Java-identical patterns (no lookaround/backrefs).
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
# last two dot-labels of the host — the flat-TLD approximation of the
# public-suffix list (good for .com/.org/...; a real deployment swaps in
# a broadcast PSL table)
REG_DOMAIN_RE = r"([^.]+\.[^.]+)$"


def url_host(url: Column) -> Column:
    """Hostname (lowercased); empty string when the URL has no scheme."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def url_path(url: Column) -> Column:
    """Path component ('' when absent)."""
    return F.regexp_extract(url, PATH_RE, 1)


def registered_domain(url: Column) -> Column:
    """Last-two-label registered domain of the host."""
    return F.regexp_extract(url_host(url), REG_DOMAIN_RE, 1)


def path_depth(url: Column) -> Column:
    """Number of non-empty path segments."""
    p = url_path(url)
    segs = F.filter(F.split(p, "/"), lambda s: F.length(s) > 0)
    return F.size(segs).cast("int")


def query_param(url: Column, key: str) -> Column:
    """Value of one query parameter (NULL when absent) — uses the same
    extraction regex shape on both engines: ``[?&]key=([^&#]*)``."""
    return F.nullif(
        F.regexp_extract(url, rf"[?&]{key}=([^&#]*)", 1), F.lit("")
    )


def domain_rollup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain corpus stats: page count, distinct hosts,
    mean path depth. ONE exchange (partial agg map-side)."""
    u = F.col(url_col)
    return (
        df.select(
            registered_domain(u).alias("domain"),
            url_host(u).alias("host"),
            path_depth(u).alias("depth"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("host").alias("n_hosts"),
            F.round(F.avg("depth"), 6).alias("avg_depth"),
        )
    )
