"""KG snapshot diff: added / removed / changed rows between two merged
snapshots.

The maintenance twin of ``operators/upsert.py``: upsert folds a delta
INTO a snapshot; diff recovers the delta BETWEEN two snapshots — what a
release pipeline publishes as change notes, what an incremental
downstream consumer (embedding refresh, index rebuild) uses to touch
only affected entities, and the audit check that an incremental fold
reproduced the full rebuild (``test_upsert`` proves fold ≡ re-merge;
``snapshot_diff(fold, re_merge)`` must be empty).

Shape at scale:

- ONE full outer join on the key — both sides shuffle-partitioned by
  ``id`` exactly once (with bucketed/Iceberg snapshot tables written by
  the pipeline's sort-order the exchange disappears entirely: both
  sides are already hash-distributed by id);
- column comparison is row-local null-safe equality (``<=>``), inside
  whole-stage codegen — no per-column joins, no UDFs;
- unchanged rows (the overwhelming majority between adjacent
  snapshots) are dropped by the post-join filter before anything else
  sees them, so downstream consumers receive O(|delta|), not O(|KG|).

Output rows carry ``change ∈ {added, removed, changed}`` and a sorted
comma-joined ``changed_cols`` list (empty for added/removed), so the
result is stable for value-hash gating.

Reference parity: the reference merges snapshots but cannot compare
them (closest surface: the edge-vs-node QC job,
``utils/edge_vs_node_check.py:23-84``, which checks referential
integrity of ONE snapshot). Diff extends that QC family to
snapshot-pair auditing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots sharing a schema. Returns
    (key, change, changed_cols) with change ∈ added/removed/changed;
    identical rows are dropped. ``compare_cols`` defaults to every
    shared non-key column (sorted for a deterministic changed_cols
    rendering)."""
    if compare_cols is None:
        compare_cols = sorted(set(old.columns) & set(new.columns) - {key})
    o = old.select(key, *compare_cols).alias("o")
    n = new.select(key, *compare_cols).alias("n")
    j = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")

    o_key, n_key = F.col(f"o.{key}"), F.col(f"n.{key}")
    # null-safe per-column difference markers (row-local, codegen)
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    out = j.select(
        F.coalesce(n_key, o_key).alias(key),
        F.when(o_key.isNull(), F.lit("added"))
        .when(n_key.isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change"),
        F.when(
            o_key.isNull() | n_key.isNull(), F.lit("")
        )
        .otherwise(F.array_join(diffs, ","))
        .alias("changed_cols"),
    )
    return out.filter(
        (F.col("change") != "changed") | (F.col("changed_cols") != "")
    )


def assert_snapshots_equal(old: DataFrame, new: DataFrame, key: str = "id"):
    """Audit helper: raise if the snapshots differ (used to prove an
    incremental fold reproduced a full rebuild). Returns the (empty)
    diff DataFrame for inspection on failure."""
    d = snapshot_diff(old, new, key=key)
    sample = d.limit(20).collect()
    if sample:
        raise AssertionError(
            f"snapshots differ: {len(sample)}+ rows, first={sample[:5]}"
        )
    return d
