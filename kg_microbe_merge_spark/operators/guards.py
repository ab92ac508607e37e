"""Guards against accidentally running quadratic correctness-baseline
plans (all-pairs crossJoin) on production-sized inputs.

The brute-force operators (``embedding_near_dups``, Levenshtein
all-pairs, ``brute_force_cosine_topk``'s broadcast query side) exist as
oracles for the LSH scale paths. At 100 TB an unguarded crossJoin is a
cluster-killer, so callers hit a hard, early error with a pointer to the
bucketed alternative instead of a hung job.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def constraint_propagation_disabled(spark):
    """Scope-disable ``spark.sql.constraintPropagation.enabled``.

    The incremental fold operators union checkpointed join outputs
    round over round; Catalyst's Union constraint rewriting can hit
    ``NoSuchElementException: key not found: <attr>`` on such plans
    (stale constraint attributes across checkpointed children). The
    folds build their plans — and eagerly checkpoint their result, so
    nothing lazy escapes the scope — with inference off; every other
    query keeps constraint propagation."""
    key = "spark.sql.constraintPropagation.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)


class TooLargeForBruteForce(ValueError):
    """Input exceeds the safety threshold for an all-pairs baseline."""


def require_small(
    df: DataFrame, max_rows: int, op: str, alternative: str
) -> None:
    """Raise :class:`TooLargeForBruteForce` when ``df`` has more than
    ``max_rows`` rows.

    Cost: one ``limit(max_rows + 1).count()`` — the scan short-circuits
    after finding max_rows + 1 rows, so the check is O(max_rows), not a
    full count of the table.
    """
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise TooLargeForBruteForce(
            f"{op}: input has > {max_rows} rows; the all-pairs baseline is "
            f"O(N²) and intended for correctness checks only. Use "
            f"{alternative} for large inputs, or pass max_rows=None to "
            f"override explicitly."
        )
