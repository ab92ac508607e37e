"""Deterministic dataset splitting for ML pipelines.

The reference DECLARES a ML-holdout operation but never implements it
(run.py:273 raises NotImplementedError). Here it is implemented the way
a 100 TB training pipeline needs it: assignment is a pure function of
the row's id — ``hash60(id || ':' || salt) % 10_000`` against
cumulative per-split thresholds — so it is

* reproducible across runs/clusters (no RNG state, no sampling drift),
* stable under data growth (a row's split never changes when other rows
  are added/removed),
* exactly mirrorable in ANSI SQL (md5-derived; DuckDB oracle in the
  driver gate),
* shuffle-free (one projection; Catalyst folds it into the scan stage).

``deterministic_sample`` is the one-split special case (reproducible
down-sampling, the everyday corpus-curation op).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60

_BUCKETS = 10_000


def _bucket(id_col: Column, salt: str) -> Column:
    return hash60(F.concat_ws(":", id_col.cast("string"), F.lit(salt))) % _BUCKETS


def holdout_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "holdout",
    out_col: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the LAST split). Default 80/10/10
    train/valid/test. Assignment: the row's hash bucket (0-9999) against
    cumulative thresholds, in the dict's insertion order.
    """
    weights = weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty map of fractions >= 0")
    if sum(weights.values()) > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {sum(weights.values())} > 1")
    names = list(weights)
    bucket = _bucket(F.col(id_col), salt)
    expr = F.lit(names[-1])
    cum = 0.0
    bounds = []
    for name in names[:-1]:
        cum += weights[name]
        bounds.append((name, int(round(cum * _BUCKETS))))
    for name, bound in reversed(bounds):
        expr = F.when(bucket < bound, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a reproducible ``fraction`` of rows by id-hash — unlike
    ``DataFrame.sample`` the kept set is identical across runs, engines,
    and partitionings."""
    bound = int(round(fraction * _BUCKETS))
    return df.filter(_bucket(F.col(id_col), salt) < bound)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance a corpus by
    language/source): each row is kept iff its id-hash bucket falls
    under its stratum's fraction. Same guarantees as
    :func:`deterministic_sample` — reproducible, growth-stable,
    shuffle-free (one filter folded into the scan), SQL-mirrorable —
    which ``DataFrame.sampleBy`` does not give (RNG per partition).
    Strata not listed in ``fractions`` keep ``default_fraction``."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0,1]: {v}")
    bound = F.lit(int(round(default_fraction * _BUCKETS)))
    for value, frac in fractions.items():
        bound = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * _BUCKETS)))
        ).otherwise(bound)
    return df.filter(_bucket(F.col(id_col), salt) < bound)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis A-ES, the reservoir recipe): each row draws a reproducible
    uniform u from its id-hash and is ranked by ``key = u^(1/w)``; the
    top-k keys are the sample, with inclusion probability increasing in
    the weight (quality-weighted corpus subsampling — the weighted
    sibling of :func:`deterministic_sample`).

    Mechanics: ranked by the monotone transform ``ln(u)/w`` DESC (same
    order as u^(1/w), no pow), tie-broken by id — a total order, so
    the k-cut is a bounded ``TakeOrderedAndProject``: shuffle-free
    scoring, never a global sort. Rows with weight <= 0 or NULL are
    excluded (a zero-weight row must never displace a weighted one).
    Deterministic per (id, salt) like every sampler here: reproducible
    across runs/engines/partitionings, SQL-mirrorable (ln parity per
    the tfidf/ngram_lm precedent).

    Returns ``(id_col, weight_col, key_micro BIGINT)``, the sampled
    rows' ids with their ranking key snapped to micro ints.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = hash60(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    # u in (0, 1]: (h + 1) / 2^60 — h is uniform on [0, 2^60)
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    key_micro = F.floor(key * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        df.filter(w.isNotNull() & (w > 0))
        .select(
            F.col(id_col),
            F.col(weight_col),
            key_micro.alias("key_micro"),
            key.alias("_key"),
        )
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(k)
        .drop("_key")
    )


def deterministic_complement(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Exactly the rows :func:`deterministic_sample` with the same
    arguments does NOT keep — a disjoint, exhaustive train/held-out
    partition of ``df`` (same hash, complementary bucket range), still
    shuffle-free and growth-stable."""
    bound = int(round(fraction * _BUCKETS))
    return df.filter(_bucket(F.col(id_col), salt) >= bound)
