"""KGX merge semantics — the reference's flagship operators, as pure
declarative DataFrame plans.

Parity map (SURVEY.md §2, reference file:line for behavior only):
- A3  nodes group-merge ............ :func:`nodes_merge`
      (codegen utils/duckdb_utils.py:319-342: per id, ``name`` =
      COALESCE(MAX(CASE WHEN provided_by IN prio THEN name END), MAX(name));
      every other column = STRING_AGG(DISTINCT c, '|' ORDER BY c);
      output ORDER BY id)
- A4  edges distinct-triple ........ :func:`edges_merge`
      (utils/duckdb_utils.py:442-448, 3-column golden output) and the
      provenance-preserving 5-column variant :func:`edges_merge_provenance`
      (the commented intent at utils/duckdb_utils.py:450-485 and golden
      tests/data/expected_edges_merged_full.tsv — required by north_star).
- W1+P2 priority dedup ranking ..... :func:`priority_dedup`
      (ROW_NUMBER ... ORDER BY CASE WHEN source_table = base THEN 1 ELSE 2,
      utils/duckdb_utils.py:167-187).
- J2/A6/U1/F6 coverage check ....... :func:`coverage_check`
      (endpoint union + left-anti + prefix category inference,
      utils/edge_vs_node_check.py:23-84).

Scale notes
-----------
* ``nodes_merge`` is one hash aggregation: Spark plans it as
  ObjectHashAggregate with map-side partial ``collect_set`` — the
  reference's manual 100k-id LIMIT/OFFSET batching (duckdb_utils.py:348-361)
  is replaced by the shuffle. For hub ids with very many duplicate rows,
  pass ``salt_buckets > 1`` to run an explicit two-phase
  (id, salt)→id aggregation so no single reducer holds a whole hub group.
* ``edges_merge`` dedup is map-side-partial ``HashAggregate`` on (s,p,o);
  at 100 TB the only knob that matters is shuffle partition count (AQE
  coalesces post-shuffle).
* ``coverage_check`` broadcasts nothing by default — both sides are
  graph-sized; Catalyst picks sort-merge anti-join and AQE splits skewed
  hub-endpoint partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..constants import (
    CATEGORY_PREFIX_MAP,
    EDGE_KEY_COLUMNS,
    EDGE_PAYLOAD_COLUMNS,
    MULTIVALUE_SEP,
    UNKNOWN_CATEGORY,
)


def pipe_agg(col: str) -> Column:
    """``STRING_AGG(DISTINCT col, '|' ORDER BY col)`` — NULL-skipping,
    sorted-distinct pipe join; NULL (not '') when the group has no
    non-null value, matching DuckDB STRING_AGG."""
    joined = F.array_join(F.array_sort(F.collect_set(F.col(col))), MULTIVALUE_SEP)
    return F.when(F.count(F.col(col)) > 0, joined).alias(col)


def priority_name(priority_sources: list[str], has_provided_by: bool = True) -> Column:
    """Name resolution rule: value from a priority ``provided_by`` source
    if any row in the group has one, else MAX(name). Degrades to plain
    MAX(name) when there is no ``provided_by`` column or no priority
    list (the rule cannot apply)."""
    if not priority_sources or not has_provided_by:
        return F.max("name").alias("name")
    prio = F.max(
        F.when(F.col("provided_by").isin(priority_sources), F.col("name"))
    )
    return F.coalesce(prio, F.max("name")).alias("name")


def nodes_merge(
    nodes: DataFrame,
    priority_sources: list[str],
    salt_buckets: int = 1,
    sort_output: bool = True,
) -> DataFrame:
    """Group-merge duplicate node rows by ``id`` (reference A3).

    With ``salt_buckets > 1`` the aggregation runs in two phases keyed on
    (id, pmod(hash(*), salt_buckets)) then id — bounding per-reducer state
    for hub ids whose duplicate count is itself huge.

    ``sort_output=True`` (default) reproduces the reference's globally
    sorted output for golden parity; pipelines feeding a partitioned
    write should pass ``False`` — a total-order range exchange on every
    merge is real money at 100 TB and a partitioned parquet consumer
    doesn't need it.
    """
    other_cols = [c for c in nodes.columns if c not in ("id", "name")]
    has_pb = "provided_by" in nodes.columns
    use_priority = bool(priority_sources) and has_pb
    if salt_buckets <= 1:
        out = nodes.groupBy("id").agg(
            priority_name(priority_sources, has_provided_by=has_pb),
            *[pipe_agg(c) for c in other_cols],
        )
    else:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in nodes.columns]), F.lit(salt_buckets))
        partial = nodes.withColumn("_salt", salt).groupBy("id", "_salt").agg(
            (
                F.max(
                    F.when(F.col("provided_by").isin(priority_sources), F.col("name"))
                )
                if use_priority
                else F.lit(None).cast("string")
            ).alias("_prio_name"),
            F.max("name").alias("_max_name"),
            *[F.collect_set(F.col(c)).alias(f"_set_{c}") for c in other_cols],
        )
        # Final phase: materialize each merged set ONCE as a named column,
        # then derive the pipe-join in a cheap post-agg projection (the
        # when/size + join both reference the materialized column instead
        # of re-evaluating flatten+distinct over the collected lists).
        merged = partial.groupBy("id").agg(
            F.coalesce(F.max("_prio_name"), F.max("_max_name")).alias("name"),
            *[
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list(F.col(f"_set_{c}"))))
                ).alias(f"_arr_{c}")
                for c in other_cols
            ],
        )
        out = merged.select(
            "id",
            "name",
            *[
                F.when(
                    F.size(F.col(f"_arr_{c}")) > 0,
                    F.array_join(F.col(f"_arr_{c}"), MULTIVALUE_SEP),
                ).alias(c)
                for c in other_cols
            ],
        )
    out = out.select("id", "name", *other_cols).select(*nodes.columns)
    return out.orderBy("id") if sort_output else out


def nodes_merge_skew_aware(
    nodes: DataFrame,
    priority_sources: list[str],
    heavy_threshold: int = 1_000_000,
    salt_buckets: int = 32,
    sort_output: bool = True,
) -> DataFrame:
    """A3 with skew handling applied ONLY where it pays.

    Spark's map-side partial aggregation already collapses hub groups
    whose *distinct* values are few (the common case — measured in
    scripts/skew_demo.py, blanket salting is a 7× pessimization there).
    What partial aggregation cannot bound is a hub id whose raw
    duplicate rows carry mostly-distinct values: all of them land on one
    reducer. This variant detects such heavy ids with a cheap count
    aggregation (itself map-side partial → tiny result, broadcast),
    routes only those through the two-phase salted merge, and merges the
    rest single-phase.
    """
    heavy_ids = (
        nodes.groupBy("id")
        .agg(F.count("*").alias("_cnt"))
        .filter(F.col("_cnt") > heavy_threshold)
        .select("id")
    )
    light = nodes.join(F.broadcast(heavy_ids), "id", "left_anti")
    heavy = nodes.join(F.broadcast(heavy_ids), "id", "left_semi")
    merged = nodes_merge(light, priority_sources, sort_output=False).unionByName(
        nodes_merge(
            heavy, priority_sources, salt_buckets=salt_buckets, sort_output=False
        )
    )
    return merged.orderBy("id") if sort_output else merged


def edges_merge(edges: DataFrame, sort_output: bool = True) -> DataFrame:
    """Distinct-(subject, predicate, object) edge union, sorted — the
    reference's 3-column golden output (payload columns dropped).
    ``sort_output=False`` skips the total-order exchange (see
    :func:`nodes_merge`)."""
    out = edges.select(*EDGE_KEY_COLUMNS).distinct()
    return out.orderBy(*EDGE_KEY_COLUMNS) if sort_output else out


def edges_merge_provenance(edges: DataFrame, sort_output: bool = True) -> DataFrame:
    """Provenance-preserving edge union: one row per (s,p,o) with
    sorted-distinct pipe-joined ``relation``/``knowledge_source`` —
    the north-star variant (golden expected_edges_merged_full.tsv).
    ``sort_output=False`` skips the total-order exchange (see
    :func:`nodes_merge`)."""
    payload = [c for c in EDGE_PAYLOAD_COLUMNS if c in edges.columns]
    out = edges.groupBy(*EDGE_KEY_COLUMNS).agg(*[pipe_agg(c) for c in payload])
    return out.orderBy(*EDGE_KEY_COLUMNS) if sort_output else out


def priority_dedup(
    df: DataFrame,
    keys: list[str],
    base_table: str,
    keep_winners: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Window dedup ranking: rows from ``base_table`` outrank subset rows
    within each key partition (reference W1); ``keep_winners`` selects
    rn = 1 vs rn > 1 (reference P2).

    ``tiebreak_cols`` extends the ordering to make row_number
    deterministic when several rows share the same priority class (the
    reference leaves this to engine order; a distributed engine must pin
    it explicitly).
    """
    order = [F.when(F.col("source_table") == base_table, 1).otherwise(2).asc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    ranked = df.withColumn("rn", F.row_number().over(w))
    cond = F.col("rn") == 1 if keep_winners else F.col("rn") > 1
    return ranked.filter(cond).drop("rn")


def infer_category(id_col: Column) -> Column:
    """Ordered startswith prefix → Biolink category chain (reference F6)."""
    expr = F.lit(UNKNOWN_CATEGORY)
    for prefix, category in reversed(CATEGORY_PREFIX_MAP):
        expr = F.when(id_col.startswith(prefix), category).otherwise(expr)
    return expr


def edge_endpoint_ids(edges: DataFrame) -> DataFrame:
    """Distinct union of subject and object ids (reference A6/U1).

    One explode over a single scan — the naive ``select(subject) UNION
    select(object)`` reads the edge table twice (at 100 TB, twice)."""
    return (
        edges.select(
            F.explode(F.array(F.col("subject"), F.col("object"))).alias("id")
        ).distinct()
    )


def coverage_check(nodes: DataFrame, edges: DataFrame, with_category: bool = True) -> DataFrame:
    """Referential-integrity check: edge endpoints missing from the node
    table (reference J2 left-anti), optionally with prefix-inferred
    category (reference's *_missing_nodes_with_category.tsv)."""
    missing = edge_endpoint_ids(edges).join(
        nodes.select("id"), on="id", how="left_anti"
    )
    if with_category:
        missing = missing.withColumn("category", infer_category(F.col("id")))
    return missing.orderBy("id")
