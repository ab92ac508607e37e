"""Sequence packing: assign documents to fixed-token-budget training
sequences (the "pack short docs into 4k-token rows" step of an LLM
pre-training pipeline).

Strategy — deterministic cumulative-sum packing, the distributed
analogue of streaming next-fit: documents are hashed into ``n_packers``
independent packer groups; inside each group they are laid out in a
deterministic hash order and a running token total assigns each doc to
the sequence where its span STARTS (``floor(cum_before / budget)``).
A document whose span crosses a budget boundary overflows its sequence
by at most that one document — the standard relaxation used by
streaming packers, accepted here because it is what makes the layout a
pure window expression (exactly mirrorable in any SQL engine) instead
of sequential state.

100 TB design: ONE exchange total — the window's hash partitioning on
``packer`` (+ in-partition sort). ``n_packers`` scales with the
cluster (groups are uniform by construction: a 60-bit id hash), no
driver round-trips, no Python. Offsets/sequence ids are deterministic
functions of the id set alone — re-runs, retries, and different input
partitionings produce the identical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_packers: int = 64,
    tokens_col: str = "n_tok",
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Assign each row to a (packer, seq_id) training sequence.

    Returns the input's id plus ``packer``, ``seq_id``, ``offset`` (token
    start position of this doc inside its sequence span) and the doc's
    ``tokens``. Documents longer than ``budget`` occupy their own
    sequence span (they start a sequence and overflow it; the next doc
    starts a fresh one).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    if n_packers <= 0:
        raise ValueError(f"n_packers must be positive: {n_packers}")
    h = hash60(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    d = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("tokens"),
        (h % n_packers).alias("packer"),
        h.alias("_order"),
    )
    w = (
        Window.partitionBy("packer")
        .orderBy("_order", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum("tokens").over(w) - F.col("tokens")
    return d.select(
        id_col,
        "packer",
        F.floor(cum_before / budget).alias("seq_id"),
        (cum_before % budget).alias("offset"),
        "tokens",
    )


def packed_sequence_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-sequence fill report: docs per sequence, token total, and the
    fill ratio against ``budget`` (sequences a long doc overflowed show
    > 1.0). One partial-aggregable groupBy."""
    return packed.groupBy("packer", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("sum_tokens"),
        F.round(F.sum("tokens") / F.lit(float(budget)), 6).alias("fill"),
    )
