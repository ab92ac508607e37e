"""Corpus mixing: temperature re-weighting and per-source caps.

The two sampling decisions every large-scale LM training-data pipeline
makes after curation (beyond the reference's scope — the reference
stops at the merged KG; these operate on the same `documents` corpus
the web-KG pipeline ingests):

* **temperature mixing** — re-weight sources so small high-quality
  sources are seen more often than their raw byte share (the
  multinomial-with-exponent recipe: sampling share of source s is
  proportional to ``n_s ** temperature``, temperature < 1 flattening
  the distribution). Implemented as a per-source deterministic
  hash-filter: one tiny count aggregation, driver-side rate
  derivation, then ONE shuffle-free filter folded into the scan —
  growth-stable and reproducible like ``operators/split.py``.

* **per-source cap** — keep at most ``cap`` documents per source
  (domain caps against boilerplate-heavy hosts). Naive
  ``row_number() over (partition by source)`` routes EVERY row of a
  giant source through one task; here a hash-threshold prefilter cuts
  each source to ~``oversample * cap`` candidate rows first, and
  because rows are ranked by the SAME hash the prefilter keeps a
  prefix of each source's hash order — the window's top-``cap`` over
  the prefix equals the true top-``cap`` whenever the prefix holds
  ``cap`` rows, which the operator verifies exactly from the window
  output itself (survivors < min(cap, n_s) raises; with the default
  oversample=4 the Chernoff bound puts the per-source failure odds
  below exp(-9·cap/8), i.e. never for any real cap).

Cross-engine exactness (driver DuckDB gate): rates use only IEEE-exact
primitives — ``sqrt`` (correctly rounded per IEEE 754, so temperatures
1, 0.5 and 0.25 are exact in Spark, DuckDB and Python alike), integer
micro-weights ``floor(w * 2^20 + 0.5)`` (the repo's round-half
protocol), order-free BIGINT sums, and one left-associated double
division chain mirrored token-for-token in the oracle SQL. General
temperatures use ``pow`` (libm, not cross-engine bit-stable) — allowed
by the API, excluded from the exactness contract.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import HASH60_SPACE, hash60
from .split import _BUCKETS

#: micro-weight scale for the integer rate protocol (2^20) — shared by
#: operators/negatives.py (one definition of the cross-engine protocol)
WEIGHT_SCALE = 1 << 20

#: temperatures/powers with an IEEE-exact n^t via sqrt chains
#: (x, sqrt·sqrt∘sqrt, sqrt, sqrt∘sqrt)
EXACT_TEMPERATURES = (1.0, 0.75, 0.5, 0.25)


def _bucket(id_col: Column, salt: str) -> Column:
    return hash60(F.concat_ws(":", id_col.cast("string"), F.lit(salt))) % _BUCKETS


def source_counts(df: DataFrame, source_col: str = "source") -> dict[str, int]:
    """Per-source row counts as a plain dict. ONE map-side-combined
    aggregation; the collect is #sources rows (corpus recipes have
    tens of sources, not millions — for per-domain work at domain
    cardinality use :func:`cap_per_source`, which never collects
    per-key state beyond this same dict)."""
    rows = df.groupBy(source_col).count().collect()
    return {r[0]: r[1] for r in rows}


def _power_weight(n: int, temperature: float) -> float:
    """n ** temperature via IEEE-exact sqrt chains when possible."""
    if temperature == 1.0:
        return float(n)
    if temperature == 0.75:
        return math.sqrt(float(n)) * math.sqrt(math.sqrt(float(n)))
    if temperature == 0.5:
        return math.sqrt(float(n))
    if temperature == 0.25:
        return math.sqrt(math.sqrt(float(n)))
    return float(n) ** temperature


def power_micro(n: int, power: float) -> int:
    """Integer micro-weight ``floor(n^power · 2^20 + 0.5)`` — THE
    cross-engine protocol constant both temperature mixing and negative
    sampling inline into their oracles (one definition so the Spark,
    DuckDB and python twins can never desynchronize)."""
    return int(math.floor(_power_weight(n, power) * WEIGHT_SCALE + 0.5))


def temperature_bounds(
    counts: dict[str, int],
    temperature: float,
    target_total: int,
) -> dict[str, int]:
    """Per-source keep-bounds (hash buckets of 10 000, the
    ``operators/split.py`` protocol) so the expected kept total is
    ``target_total`` with source shares proportional to
    ``n_s ** temperature``.

    Integer protocol (exact in Spark/DuckDB/Python for the
    :data:`EXACT_TEMPERATURES`): micro-weights
    ``w_s = floor(n_s**t * 2^20 + 0.5)``, order-free integer total,
    then ``bound_s = clamp(floor(10000·T·w_s / total_w / n_s + 0.5),
    0, 10000)`` as one left-associated double chain. Sources whose
    fair share exceeds their size clamp at keep-everything (realized
    total then lands under ``target_total``; re-run with a larger
    target or drop the capped source from the budget if exact totals
    matter — deliberately NOT silently re-normalized, so the oracle
    stays a one-pass expression)."""
    if target_total < 0:
        raise ValueError(f"target_total must be >= 0: {target_total}")
    micro = {s: power_micro(n, temperature) for s, n in counts.items()}
    total_w = sum(micro.values())
    if total_w == 0:
        return {s: 0 for s in counts}
    bounds = {}
    for s, n in counts.items():
        raw = math.floor(
            float(_BUCKETS) * target_total * micro[s] / total_w / n + 0.5
        )
        bounds[s] = max(0, min(_BUCKETS, int(raw)))
    return bounds


def temperature_mix(
    df: DataFrame,
    temperature: float = 0.5,
    target_total: int | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministically keep ~``target_total`` rows with per-source
    shares proportional to ``count ** temperature``.

    Plan shape: the bounds are inlined as a literal CASE map (sources
    are few), so the result is ONE filter folded into the scan — no
    join, no shuffle, growth-stable per row like
    ``split.deterministic_sample``. ``counts`` may be passed to skip
    the counting aggregation when the caller already has it (e.g. from
    a previous pipeline stage's metrics)."""
    counts = counts or source_counts(df, source_col)
    if target_total is None:
        target_total = sum(counts.values()) // 2
    bounds = temperature_bounds(counts, temperature, target_total)
    bound_col = F.lit(0)
    for s, b in bounds.items():
        bound_col = F.when(F.col(source_col) == s, F.lit(b)).otherwise(bound_col)
    return df.filter(_bucket(F.col(id_col), salt) < bound_col)


def cap_thresholds(
    counts: dict[str, int], cap: int, oversample: int = 4
) -> dict[str, int]:
    """Raw 60-bit hash thresholds keeping ~``oversample * cap`` rows
    per source (everything when the source is already small enough).
    ``floor((2^60 · oc) / n)`` — one double product + one division,
    mirrored exactly in the oracle SQL."""
    oc = oversample * cap
    return {
        s: HASH60_SPACE
        if n <= oc
        else int(math.floor(float(HASH60_SPACE) * float(oc) / n))
        for s, n in counts.items()
    }


class CapPrefilterInsufficient(RuntimeError):
    """The hash prefilter kept fewer than min(cap, n_s) rows for some
    source — retry with a larger ``oversample``. With oversample=4
    this requires a > 3-sigma-per-Chernoff binomial tail event."""


def cap_per_source(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap",
    counts: dict[str, int] | None = None,
    oversample: int = 4,
    verify: bool = True,
    rank_col: str = "rank_in_source",
) -> DataFrame:
    """Keep at most ``cap`` rows per source, chosen deterministically
    (the ``cap`` smallest seeded id-hashes, ties broken by id).

    Skew safety at 100 TB: the threshold prefilter bounds the rows any
    single window task sees at ~``oversample*cap`` regardless of source
    size, so a 90 %-of-corpus domain costs the same as a tiny one.
    Because the prefilter condition (hash < threshold) is a PREFIX of
    the ranking order (same hash), the result is exact — not an
    approximation — whenever the prefix covers ``cap`` rows.

    ``verify=True`` (default) checks exactly that from the output row
    counts against the already-known per-source totals and raises
    :class:`CapPrefilterInsufficient` otherwise; it re-reads only the
    capped output (≤ cap × #sources rows), never the input."""
    if cap <= 0:
        raise ValueError(f"cap must be positive: {cap}")
    counts = counts or source_counts(df, source_col)
    thr = cap_thresholds(counts, cap, oversample)
    thr_col = F.lit(0).cast("long")
    for s, t in thr.items():
        thr_col = F.when(F.col(source_col) == s, F.lit(t)).otherwise(thr_col)
    h = hash60(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    pre = df.withColumn("_h", h).filter(F.col("_h") < thr_col)
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(F.col("_h"), F.col(id_col))
    out = (
        pre.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= cap)
        .drop("_h")
    )
    if verify:
        got = {
            r[0]: r[1]
            for r in out.groupBy(source_col).count().collect()
        }
        short = {
            s: (got.get(s, 0), min(cap, n))
            for s, n in counts.items()
            if got.get(s, 0) < min(cap, n)
        }
        if short:
            raise CapPrefilterInsufficient(
                f"prefilter kept too few rows for {short} "
                f"(got, needed) — raise oversample above {oversample}"
            )
    return out
