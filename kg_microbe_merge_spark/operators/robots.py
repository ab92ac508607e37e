"""robots.txt parsing and fetch-permission evaluation — the crawl
gate between frontier discovery (``operators/frontier.py``) and
politeness scheduling (``streaming/politeness.py``).

The reference pipeline consumes already-fetched tarballs
(`/root/reference/kg_microbe_merge/download.py:6-27`); a web-scale
crawl must decide PER URL whether fetching is permitted at all. This
module implements the deterministic core of RFC 9309:

* :func:`parse_robots` — per-host robots.txt text → (host, rule_allow,
  rule_path) rows, via one Arrow-batched pandas UDF (the same
  vectorized-text-parse discipline as ``functions/extract.py``; a
  robots file is row-local by definition). Group model: consecutive
  ``User-agent:`` lines open a group; the group whose agent token
  exactly matches (case-insensitive) is selected, else the ``*``
  group; rules from ALL groups naming the selected token merge
  (RFC 9309 §2.2.1). Empty-path rules are ignored (an empty
  ``Disallow:`` means allow-all). Supported rule paths are LITERAL
  PREFIXES — rules using the optional ``*``/``$`` wildcard extension
  are dropped and counted (``n_wildcard_dropped``), never silently
  misread as literals. Rules are capped at ``max_rules`` per host
  (RFC caps parseable size at 500 KiB; a million-rule robots file is
  an attack, not a policy).
* :func:`robots_decisions` — urls × rules → per-url verdict using the
  RFC match: among rules whose path is a prefix of the url path, the
  LONGEST path wins; on a length tie ALLOW wins (§2.2.2); a host with
  no applicable rules (or no robots row at all) defaults to allowed.
* :func:`allowed_frontier` — convenience filter of the above.

Scale shape (10^9-host frontier): the parse is one pass over the
(small: one row per HOST, not per url) robots table with zero shuffle;
the evaluation is ONE host-equi join — the same key the politeness
stage partitions by, so on a bucketed crawl store the join is
co-located — followed by ONE map-side-combinable ``max(struct)``
aggregation per url (longest-match selection is an ordinary max over
(path_length, allow, path), no window, no per-url rule list
materialization). Rules per host are bounded by ``max_rules``, so the
join fan-out per url is bounded; hub hosts (Zipf) multiply by at most
that constant. When the rule table is small enough, wrap it in
``F.broadcast`` at the call site and the join is shuffle-free.

Evaluation semantics are mirrored 1:1 in :func:`decisions_sql` (the
DuckDB twin used by the correctness gate), so the whole parse+evaluate
path is oracle-checked end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kg_microbe_merge_spark.functions.urls import url_host, url_path

_RULE_SCHEMA = T.StructType(
    [
        T.StructField("rule_allow", T.BooleanType()),
        T.StructField("rule_path", T.StringType()),
        T.StructField("n_wildcard_dropped", T.IntegerType()),
    ]
)


def _parse_one(text: str, agent: str, max_rules: int):
    """Pure-python RFC 9309 subset parser for ONE robots.txt body.
    Returns (rules, n_wildcard_dropped) where rules is a list of
    (allow: bool, path: str) for the selected agent token."""
    groups: dict[str, list] = {}
    pending: list[str] = []
    current: list[list] = []
    saw_rule = False
    for raw in (text or "").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if saw_rule:  # a rule closed the previous group
                pending, current, saw_rule = [], [], False
            tok = val.lower()
            pending.append(tok)
            groups.setdefault(tok, [])
            current = [groups[t] for t in pending]
        elif key in ("allow", "disallow"):
            if not current:
                continue  # rule before any user-agent line: ignored
            saw_rule = True
            for bucket in current:
                bucket.append((key == "allow", val))
    chosen = groups.get(agent.lower())
    if chosen is None:
        chosen = groups.get("*", [])
    rules, dropped = [], 0
    for allow, path in chosen:
        if not path:
            continue  # empty path: allow-all no-op (RFC 9309 §2.2.2)
        if "*" in path or "$" in path:
            dropped += 1  # wildcard extension: out of literal subset
            continue
        rules.append((allow, path))
        if len(rules) >= max_rules:
            break
    return rules, dropped


def parse_robots(
    robots: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    max_rules: int = 1000,
) -> DataFrame:
    """(host, robots_txt) → exploded (host, rule_allow, rule_path,
    n_wildcard_dropped) for the rule group RFC 9309 selects for
    ``user_agent``. Hosts whose selected group has no literal-prefix
    rules emit no rows (equivalent to no robots file: allowed)."""
    if max_rules < 1:
        raise ValueError(f"max_rules must be >= 1, got {max_rules}")

    @F.pandas_udf(T.ArrayType(_RULE_SCHEMA))
    def _rules(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            rules, dropped = _parse_one(text, user_agent, max_rules)
            out.append(
                [
                    {
                        "rule_allow": a,
                        "rule_path": p,
                        "n_wildcard_dropped": dropped,
                    }
                    for a, p in rules
                ]
            )
        return pd.Series(out)

    return robots.select(
        F.col(host_col).alias("host"),
        F.explode(_rules(F.col(robots_col))).alias("_r"),
    ).select(
        "host",
        F.col("_r.rule_allow").alias("rule_allow"),
        F.col("_r.rule_path").alias("rule_path"),
        F.col("_r.n_wildcard_dropped").alias("n_wildcard_dropped"),
    )


def _norm_path(url: Column) -> Column:
    """Match target: the url's path component, '/' when empty."""
    p = url_path(url)
    return F.when((p.isNull()) | (p == ""), F.lit("/")).otherwise(p)


def robots_decisions(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-url fetch verdict: (url, host, allowed, rule_allow,
    rule_path). ``rules`` is :func:`parse_robots` output (already
    agent-selected). Longest matching rule path wins; allow wins a
    length tie; no matching rule (or no rules for the host) → allowed
    with NULL rule columns."""
    u = urls.select(
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        _norm_path(F.col(url_col)).alias("_path"),
    )
    j = u.join(
        rules.select("host", "rule_allow", "rule_path"), "host", "left"
    )
    # a rule participates only if its path prefixes the url path; the
    # winner is max(struct(len, allow, path)) — max ignores the NULLs
    # from non-matching/missing rules, so "no winner" = allowed.
    m = F.when(
        F.col("rule_path").isNotNull()
        & F.col("_path").startswith(F.col("rule_path")),
        F.struct(
            F.length("rule_path").alias("l"),
            F.col("rule_allow").alias("a"),
            F.col("rule_path").alias("p"),
        ),
    )
    best = (
        j.withColumn("_m", m)
        .groupBy("url")
        .agg(
            F.first("host").alias("host"),
            F.max("_m").alias("_best"),
        )
    )
    return best.select(
        "url",
        "host",
        F.coalesce(F.col("_best.a"), F.lit(True)).alias("allowed"),
        F.col("_best.a").alias("rule_allow"),
        F.col("_best.p").alias("rule_path"),
    )


def allowed_frontier(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """The urls :func:`robots_decisions` permits, original column
    name preserved."""
    return (
        robots_decisions(urls, rules, url_col)
        .filter(F.col("allowed"))
        .select(F.col("url").alias(url_col))
    )


def decisions_sql(urls_cte: str, rules_cte: str) -> str:
    """DuckDB twin of :func:`robots_decisions`: same longest-prefix /
    allow-wins / default-allowed semantics over CTE names providing
    ``(url, host, pth)`` and ``(host, rule_allow, rule_path)``. The
    tie-break chain mirrors Spark's struct-max ordering exactly
    (length, then allow with true > false, then path)."""
    return f"""
        j AS (
            SELECT u.url, u.host, u.pth, r.rule_allow, r.rule_path,
                   (r.rule_path IS NOT NULL
                    AND starts_with(u.pth, r.rule_path)) AS m
            FROM {urls_cte} u LEFT JOIN {rules_cte} r USING (host)),
        ranked AS (
            SELECT url, host, rule_allow, rule_path,
                   row_number() OVER (
                       PARTITION BY url
                       ORDER BY m DESC,
                                length(rule_path) DESC,
                                rule_allow DESC,
                                rule_path DESC) AS rn,
                   m
            FROM j),
        verdict AS (
            SELECT url, host,
                   CASE WHEN m THEN rule_allow ELSE true END AS allowed,
                   CASE WHEN m THEN rule_allow END AS rule_allow,
                   CASE WHEN m THEN rule_path END AS rule_path
            FROM ranked WHERE rn = 1)
    """
