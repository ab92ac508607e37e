"""Model-based quality filtering: hashed-feature linear classifier.

Web-corpus curation pipelines (CCNet, fastText quality filters, Gopher/
FineWeb-style cleaning) score every document with a trained linear model
over hashed bag-of-words features and keep documents above a threshold.
The reference has no model-inference operator (its quality signals are
the heuristics ported in functions/text.py); this closes that gap with
the standard hashing-trick inference kernel:

    score(doc) = ( Σ_t  W[ h(t) mod D ] ) / (scale · n_tokens)

evaluated ENTIRELY JVM-side: the weight table is inlined as an array
literal into whole-stage codegen (the "broadcast the model" pattern —
for a D ≤ a few thousand table the literal beats a broadcast join
because it never leaves the projection), tokens come from the same
row-local normalize+split used everywhere else, and the feature lookup
plus sum run inside one ``aggregate`` fold per row. ZERO shuffle, zero
Python.

Exactness contract (the driver's DuckDB oracle verifies value-for-value):
weights are INTEGERS, so the fold is exact int64 arithmetic in any
evaluation order; the single float division + round(…, 6) at the end is
the same IEEE-double op in both engines. The token hash is the portable
md5-derived ``hash60`` (functions/hashing.py).

Scale notes
-----------
* Per-row work is O(n_tokens) with one md5 per token — the same cost
  class as the shingle producers; no exchange is introduced, so model
  scoring fuses into whatever scan/filter stage already reads the text.
* Real trained models with millions of parameters don't fit a literal:
  ship them with ``SparkContext.broadcast`` into an Arrow-batched pandas
  UDF (``numpy`` dot over a CSR/dense weight vector per batch) — same
  signature, same oracle-free path as functions/extract.py. The literal
  path here is the right shape for distilled / pruned filter models
  (fastText quality filters are commonly quantized to ≤ 2^18 buckets).
* Weights here are synthesized deterministically from the bucket index
  (a stand-in for a trained artifact — the task sandbox has no training
  data); ``model_weights`` is the single source both engines share.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import hash60, hash60_py, hash60_sql
from .text import normalized_text, token_count_ws

#: default feature-hash buckets (kept small so the oracle SQL literal
#: stays readable; the kernel is unchanged at 2^18 buckets)
DEFAULT_DIM = 256
#: weights are integers in [-SCALE, SCALE]
SCALE = 8


def model_weights(dim: int = DEFAULT_DIM, family: str = "qmodel") -> list[int]:
    """Deterministic integer weight table in ``[-SCALE, SCALE]`` — the
    stand-in for a trained model artifact, derived bucket-by-bucket from
    the portable hash so Spark, DuckDB, and Python share it exactly."""
    span = 2 * SCALE + 1
    return [hash60_py(f"{family}-w:{j}") % span - SCALE for j in range(dim)]


def hashed_linear_score(
    text: Column, dim: int = DEFAULT_DIM, family: str = "qmodel"
) -> Column:
    """Normalized model score in ``[-1, 1]`` (round 6): mean weight of
    the document's hashed tokens divided by SCALE; 0.0 for empty text."""
    w = model_weights(dim, family)
    table = F.array(*[F.lit(x) for x in w])
    toks = F.split(normalized_text(text), " ")
    n = token_count_ws(text)
    raw = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(table, (hash60(t) % F.lit(dim)).cast("int") + F.lit(1)).cast(
            "long"
        ),
    )
    return F.when(
        n > 0,
        F.round(
            raw.cast("double") / (F.lit(float(SCALE)) * n.cast("double")), 6
        ),
    ).otherwise(F.lit(0.0))


def model_keep(
    text: Column,
    threshold: float = 0.0,
    dim: int = DEFAULT_DIM,
    family: str = "qmodel",
) -> Column:
    """Boolean keep decision: ``score >= threshold``."""
    return hashed_linear_score(text, dim, family) >= F.lit(threshold)


def hashed_linear_score_pandas(
    df,
    text_col: str = "text",
    out_col: str = "model_score",
    dim: int = DEFAULT_DIM,
    family: str = "qmodel",
):
    """Broadcast-model inference path for weight tables too large to
    inline as a literal (real fastText-class filters: 2^18–2^21 buckets
    × classes): the weight vector is shipped once per executor with
    ``SparkContext.broadcast`` and applied inside an Arrow-batched
    ``mapInPandas`` — one numpy gather+add per batch, no per-row Python.

    Returns ``df`` plus ``out_col``; scores are bit-identical to
    :func:`hashed_linear_score` (same md5 token hash, same integer
    weights, same final rounded division), which the test suite asserts
    — so the literal path remains the oracle-gated semantics and this
    path is its scale twin.

    Scale notes: the broadcast is O(dim) once per executor, the
    per-batch cost is one vectorized hash + ``np.add.at`` scatter; the
    operator preserves partitioning (no exchange). The md5 hashing here
    is per-token Python-side ``hashlib`` — vectorized over the batch's
    token stream, matching the JVM path's md5; swap the token hash for
    a numpy xxhash for peak throughput when oracle parity is not
    needed.
    """
    import pandas as pd

    spark = df.sparkSession
    w_b = spark.sparkContext.broadcast(
        __import__("numpy").array(model_weights(dim, family), dtype="int64")
    )
    fields = df.schema.fieldNames()
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} double"]
    )

    def _score_batches(batches):
        import numpy as np

        w = w_b.value
        bucket_cache: dict[str, int] = {}  # token -> hashed bucket

        def _bucket(tok: str) -> int:
            b = bucket_cache.get(tok)
            if b is None:
                b = bucket_cache[tok] = hash60_py(tok) % dim
            return b

        for pdf in batches:
            n_rows = len(pdf)
            # python str.split() == the normalize contract (lowercase,
            # collapse whitespace runs, trim)
            tok_lists = pdf[text_col].fillna("").str.lower().str.split()
            flat: list[int] = []
            row_of: list[int] = []
            counts = np.zeros(n_rows, dtype="int64")
            for i, toks in enumerate(tok_lists):
                if not toks:
                    continue
                counts[i] = len(toks)
                flat.extend(_bucket(t) for t in toks)
                row_of.extend([i] * len(toks))
            raw = np.zeros(n_rows, dtype="int64")
            if flat:
                np.add.at(
                    raw,
                    np.asarray(row_of, dtype="int64"),
                    w[np.asarray(flat, dtype="int64")],
                )
            # HALF_UP to 6 decimals like Spark's F.round (np.round is
            # half-even and diverges on exact dyadic ties, e.g.
            # 41/128 = 0.3203125 → Spark 0.320313, np.round 0.320312)
            scaled = raw / (float(SCALE) * np.maximum(counts, 1))
            half_up = np.sign(scaled) * (
                np.floor(np.abs(scaled) * 1e6 + 0.5) / 1e6
            )
            scores = np.where(counts > 0, half_up, 0.0)
            out = pdf.copy()
            out[out_col] = scores
            yield out

    return df.mapInPandas(_score_batches, schema=out_schema)


def hashed_linear_score_sql(
    text_expr: str, dim: int = DEFAULT_DIM, family: str = "qmodel"
) -> str:
    """DuckDB twin of :func:`hashed_linear_score` for the oracle gate."""
    w = model_weights(dim, family)
    table = "[" + ", ".join(str(x) for x in w) + "]"
    norm = f"trim(regexp_replace(lower({text_expr}), '\\s+', ' ', 'g'))"
    toks = f"regexp_split_to_array({norm}, ' ')"
    n_tok = (
        f"CASE WHEN length(trim({text_expr})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({text_expr}), '\\s+')) END"
    )
    raw = (
        f"list_sum(list_transform({toks}, "
        f"t -> ({table})[(({hash60_sql('t')}) % {dim})::INT + 1]))"
    )
    return (
        f"CASE WHEN ({n_tok}) > 0 THEN "
        f"round(({raw})::DOUBLE / ({float(SCALE)} * ({n_tok})::DOUBLE), 6) "
        f"ELSE 0.0 END"
    )
