"""Continuous KG snapshot maintenance: streaming deltas folded into the
merged snapshot with the incremental upsert operator.

The production pattern for a KG that never stops ingesting: raw node
deltas arrive as append-only files (file source standing in for an
Iceberg/queue source), and each micro-batch is folded into the merged
snapshot via ``operators/upsert.nodes_merge_incremental`` inside
``foreachBatch`` — the snapshot side is never shuffled (the upsert's
broadcast carve-out), so a micro-batch costs O(delta), not O(KG).

Correctness under streaming semantics:

* **exactly-once effect without sink transactions**: the A3 fold is
  IDEMPOTENT — pipe-joined columns are set-unions and the name rule is
  a max, so re-folding a replayed micro-batch (Spark's foreachBatch
  at-least-once contract after a failure) converges to the same
  snapshot. Tested as ``fold(fold(S, d), d) == fold(S, d)``.
* **atomic publish**: each batch writes the next snapshot to a tmp dir
  and ``os.replace``s it in — readers never observe a half-written
  snapshot (the pipeline.py commit protocol).
* **the batch-equivalence invariant** (driver-gated for the operator
  itself as ``kg_incremental_upsert``) extends to streams: after
  draining any prefix of the delta stream, the snapshot equals the
  one-shot batch merge of all rows seen so far.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..operators.merge import edges_merge_provenance
from ..operators.upsert import (
    edges_merge_incremental,
    nodes_merge_incremental,
    nodes_merge_with_state,
)


def fold_edges_batch(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_dir: str,
) -> None:
    """Edge twin of :func:`fold_batch`: fold one raw edge delta into the
    provenance-merged (s,p,o) snapshot. Same guarantees — idempotent
    (set-union payloads), atomic swap, O(delta) per batch with the
    snapshot never shuffled."""
    if not batch.take(1):
        return
    if os.path.exists(snapshot_dir):
        snapshot = spark.read.parquet(snapshot_dir)
        new_snap = edges_merge_incremental(snapshot, batch, sort_output=False)
    else:
        new_snap = edges_merge_provenance(batch, sort_output=False)
    tmp = snapshot_dir + "._tmp"
    new_snap.write.mode("overwrite").parquet(tmp)
    if os.path.exists(snapshot_dir):
        shutil.rmtree(snapshot_dir)
    os.replace(tmp, snapshot_dir)


def fold_batch(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_dir: str,
    priority_sources: list[str],
) -> None:
    """Fold one delta batch into the on-disk snapshot (atomic swap).
    Safe to call again with the same batch — the fold is idempotent."""
    if not batch.take(1):
        return
    if os.path.exists(snapshot_dir):
        snapshot = spark.read.parquet(snapshot_dir)
        new_snap = nodes_merge_incremental(
            snapshot, batch, priority_sources, sort_output=False
        )
    else:
        new_snap = nodes_merge_with_state(
            batch, priority_sources, sort_output=False
        )
    tmp = snapshot_dir + "._tmp"
    new_snap.write.mode("overwrite").parquet(tmp)
    if os.path.exists(snapshot_dir):
        shutil.rmtree(snapshot_dir)
    os.replace(tmp, snapshot_dir)


def run_kg_maintenance_stream(
    spark: SparkSession,
    delta_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    priority_sources: list[str],
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Launch the delta-stream → snapshot maintenance query.

    ``available_now=True`` drains what is currently in ``delta_dir``
    and stops (the incremental-batch mode); resuming later from
    ``checkpoint_dir`` folds only files added since."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    deltas = reader.parquet(delta_dir)

    def _fold(batch: DataFrame, epoch_id: int) -> None:
        fold_batch(spark, batch, snapshot_dir, priority_sources)

    writer = (
        deltas.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
