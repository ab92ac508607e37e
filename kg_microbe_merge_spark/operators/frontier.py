"""Crawl-frontier operators: URL canonicalization + politeness-aware
fetch scheduling.

The corpus side of the north-star pipeline starts at a crawl frontier:
billions of candidate URLs that must be (a) canonicalized so the same
resource isn't fetched/stored twice under trivially different spellings
and (b) scheduled so no host is hammered — the classic per-host
politeness constraint (one in-flight fetch per host per wave).

Canonicalization (:func:`canonical_url`) is a fixed, deterministic rule
chain — entirely row-local string expressions (whole-stage codegen,
zero shuffle, zero Python), mirrored rule for rule in the DuckDB twin:

1. strip the fragment (``#...``);
2. lowercase the scheme+authority prefix (path/query case preserved —
   paths are case-sensitive on most servers);
3. drop default ports (``http://h:80`` → ``http://h``,
   ``https://h:443`` → ``https://h``);
4. drop tracking query parameters (``utm_*``, ``utm``, ``fbclid``,
   ``gclid``, ``ref``) and ALPHABETICALLY SORT the survivors (query
   order is almost never semantic; sorting makes param order
   canonical); an emptied query drops its ``?``;
5. drop a single trailing slash from a non-root path.

Exact-dup grouping by ``canonical_url`` then collapses the frontier
with the same hash-groupBy discipline as ``dedup_exact`` — the shuffle
key is the canonical string (or its md5), never the page.

Scheduling (:func:`fetch_schedule`) assigns each URL a politeness
**slot**: ``row_number`` within its host ordered by (priority DESC,
url ASC), so slot *t* across all hosts forms wave *t* — a set that
touches every host at most once and can be fetched concurrently.
``max_per_host`` caps a host's total budget: the cap is a filter on
the row_number, which Spark executes as WindowGroupLimit with a
map-side Partial rank — at most ``cap`` rows per host per map
partition cross the ONE hash exchange. Zipf hub hosts (the crawl's
skew) are therefore bounded at the source, and the wave histogram
(:func:`schedule_stats`) is a tiny per-slot rollup.

Reference parity: no crawl machinery exists in the reference (it
downloads two fixed tarballs — run.py download step); this is part of
the web-scale corpus mandate, upstream of ``sources/corpus`` and the
streaming curation feed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: query-parameter names (exact) and prefixes dropped by rule 4
TRACKING_EXACT = ("utm", "fbclid", "gclid", "ref")
TRACKING_PREFIX = "utm_"

_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def _is_tracking(kv: Column) -> Column:
    key = F.split(kv, "=")[0]
    cond = key.startswith(TRACKING_PREFIX)
    for k in TRACKING_EXACT:
        cond = cond | (key == F.lit(k))
    return cond


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` under the five rules above — one
    row-local expression tree, no shuffle, no Python."""
    u = F.regexp_replace(url, r"#.*$", "")  # 1. fragment
    prefix = F.regexp_extract(u, _PREFIX_RE, 1)
    rest = F.substring(u, F.length(prefix) + F.lit(1), F.lit(1 << 30))
    pfx = F.lower(prefix)
    # 3. default ports (Java replacement uses $1; DuckDB twin uses \1)
    pfx = F.regexp_replace(pfx, r"^(http://[^/:]+):80$", "$1")
    pfx = F.regexp_replace(pfx, r"^(https://[^/:]+):443$", "$1")
    # 4. query params: drop tracking, sort survivors (query = after the
    # FIRST '?', matching the twin's leftmost regex)
    qs = F.regexp_extract(rest, r"\?(.*)$", 1)
    has_q = rest.contains("?")
    params = F.filter(
        F.split(qs, "&"),
        lambda kv: (kv != F.lit("")) & ~_is_tracking(kv),
    )
    qs_canon = F.array_join(F.array_sort(params), "&")
    # 5. trailing slash on non-root path
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path_canon = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - F.lit(1)),
    ).otherwise(path)
    return F.concat(
        pfx,
        path_canon,
        F.when(
            has_q & (qs_canon != F.lit("")), F.concat(F.lit("?"), qs_canon)
        ).otherwise(F.lit("")),
    )


def canonicalize_urls(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Adds ``canonical_url`` plus ``canon_group`` — how many frontier
    rows collapse onto this canonical form (partition-only window; the
    exact-dup signal before the frontier dedup)."""
    out = df.withColumn("canonical_url", canonical_url(F.col(url_col)))
    w = Window.partitionBy("canonical_url")
    return out.withColumn(
        "canon_group", F.count(F.lit(1)).over(w).cast("long")
    )


def fetch_schedule(
    df: DataFrame,
    url_col: str = "canonical_url",
    priority_col: str | None = None,
    max_per_host: int | None = None,
) -> DataFrame:
    """Politeness slots: ``(url, host, slot)`` where slot *t* across
    hosts is a concurrently-fetchable wave (each host once per wave).
    Priority DESC then url ASC within each host; ``max_per_host``
    drops everything past a host's budget (WindowGroupLimit — the cap
    is enforced map-side before the exchange)."""
    from ..functions.urls import url_host

    u = F.col(url_col)
    base = df.select(
        u.alias("url"),
        url_host(u).alias("host"),
        (
            F.col(priority_col) if priority_col else F.length(u)
        ).cast("long").alias("_prio"),
    )
    w = Window.partitionBy("host").orderBy(F.desc("_prio"), F.asc("url"))
    out = base.withColumn("rn", F.row_number().over(w))
    if max_per_host is not None:
        if max_per_host < 1:
            raise ValueError(
                f"max_per_host must be >= 1, got {max_per_host}"
            )
        out = out.filter(F.col("rn") <= max_per_host)
    return out.select(
        "url", "host", (F.col("rn") - 1).cast("long").alias("slot")
    )


def schedule_stats(schedule: DataFrame) -> DataFrame:
    """Wave histogram: per slot, how many URLs/hosts fetch in that
    wave (ONE tiny map-side-partial rollup; max slot + 1 = the
    politeness makespan)."""
    return schedule.groupBy("slot").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
    )


# --------------------------------------------------------------------------
# DuckDB twins
# --------------------------------------------------------------------------


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` (RE2 ``\\1`` backrefs
    instead of Java's ``$1``; identical rules and patterns)."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    prefix = f"regexp_extract({u}, '{_PREFIX_RE}', 1)"
    pfx = (
        f"regexp_replace(regexp_replace(lower({prefix}),"
        f" '^(http://[^/:]+):80$', '\\1'),"
        f" '^(https://[^/:]+):443$', '\\1')"
    )
    rest = f"substr({u}, length({prefix}) + 1)"
    path = f"regexp_extract({rest}, '^([^?]*)', 1)"
    path_canon = (
        f"CASE WHEN length({path}) > 1 AND {path} LIKE '%/'"
        f" THEN substr({path}, 1, length({path}) - 1) ELSE {path} END"
    )
    qs = f"CASE WHEN {rest} LIKE '%?%' THEN regexp_extract({rest}, '\\?(.*)$', 1) ELSE '' END"
    track = " OR ".join(
        [f"str_split(kv, '=')[1] = '{k}'" for k in TRACKING_EXACT]
        + [f"starts_with(str_split(kv, '=')[1], '{TRACKING_PREFIX}')"]
    )
    params = (
        f"list_sort(list_filter(str_split({qs}, '&'),"
        f" kv -> kv <> '' AND NOT ({track})))"
    )
    qs_canon = f"array_to_string({params}, '&')"
    return (
        f"({pfx} || {path_canon} || "
        f"CASE WHEN {rest} LIKE '%?%' AND {qs_canon} <> ''"
        f" THEN '?' || {qs_canon} ELSE '' END)"
    )


def fetch_schedule_sql(
    urls_sql: str,
    priority_expr: str = "length(url)",
    max_per_host: int | None = None,
    host_re: str | None = None,
) -> str:
    """DuckDB twin of :func:`fetch_schedule` over a relation with a
    ``url`` column (same window order; host via the shared regex)."""
    from ..functions.urls import HOST_RE

    hre = host_re or HOST_RE
    cap = (
        f"WHERE rn <= {max_per_host}" if max_per_host is not None else ""
    )
    return f"""
        WITH fs_u AS (
            SELECT url, lower(regexp_extract(url, '{hre}', 1)) AS host,
                   ({priority_expr})::BIGINT AS prio
            FROM ({urls_sql})),
        fs_r AS (
            SELECT url, host,
                   row_number() OVER (
                       PARTITION BY host
                       ORDER BY prio DESC, url ASC) AS rn
            FROM fs_u)
        SELECT url, host, (rn - 1)::BIGINT AS slot FROM fs_r {cap}
    """


# --------------------------------------------------------------------------
# Python twin (tests)
# --------------------------------------------------------------------------


def canonical_url_py(url: str) -> str:
    import re

    u = re.sub(r"#.*$", "", url)
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", u)
    prefix = m.group(0) if m else ""
    rest = u[len(prefix):]
    pfx = prefix.lower()
    pfx = re.sub(r"^(http://[^/:]+):80$", r"\1", pfx)
    pfx = re.sub(r"^(https://[^/:]+):443$", r"\1", pfx)
    path, _, qs = rest.partition("?")
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    kept = []
    for kv in qs.split("&"):
        if not kv:
            continue
        key = kv.split("=")[0]
        if key in TRACKING_EXACT or key.startswith(TRACKING_PREFIX):
            continue
        kept.append(kv)
    q = "&".join(sorted(kept))
    return pfx + path + (("?" + q) if ("?" in rest and q) else "")
