"""Continuous KG snapshot maintenance: streaming deltas folded into the
merged snapshot with the incremental upsert operators.

The production pattern for a KG that never stops ingesting: raw node
(or edge) deltas arrive as append-only files (file source standing in
for an Iceberg/queue source), and each micro-batch is folded into the
merged snapshot via ``operators/upsert`` inside ``foreachBatch`` — the
snapshot side is never shuffled (the upsert's broadcast carve-out), so
a micro-batch costs O(delta), not O(KG).

Correctness under streaming semantics:

* **exactly-once effect without sink transactions**: the fold is
  IDEMPOTENT — pipe-joined columns are set-unions and the name rule is
  a max, so re-folding a replayed micro-batch (Spark's foreachBatch
  at-least-once contract after a failure) converges to the same
  snapshot. Tested as ``fold(fold(S, d), d) == fold(S, d)``.
* **crash-safe atomic publish**: the snapshot base dir holds immutable
  version dirs ``v<epoch>`` plus a ``CURRENT`` pointer file; a batch
  writes the NEXT version in full, then flips the pointer with an
  atomic single-file ``os.replace``. The previous version is deleted
  only AFTER the flip, so there is no instant at which the accumulated
  state exists nowhere on disk (a plain rmtree-then-rename swap has
  exactly that window — a crash inside it silently truncates the KG to
  whatever the replayed micro-batch contains). Readers (and the next
  fold) always resolve through :func:`read_snapshot`.
* **the batch-equivalence invariant** (driver-gated for the operators
  themselves as ``kg_incremental_upsert`` / ``kg_incremental_edges``)
  extends to streams: after draining any prefix of the delta stream,
  the snapshot equals the one-shot batch merge of all rows seen so far.
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

_CURRENT = "CURRENT"


def _current_version(base_dir: str) -> str | None:
    ptr = os.path.join(base_dir, _CURRENT)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    path = os.path.join(base_dir, name)
    return path if name and os.path.exists(path) else None


def read_snapshot(spark: SparkSession, base_dir: str) -> DataFrame | None:
    """Resolve the CURRENT pointer and read that snapshot version
    (None when no version has been published yet)."""
    cur = _current_version(base_dir)
    return spark.read.parquet(cur) if cur else None


def _publish(df: DataFrame, base_dir: str) -> None:
    """Write ``df`` as the next immutable version, flip CURRENT
    atomically, then garbage-collect older versions. A crash at any
    point leaves a readable snapshot: before the flip the old version
    is untouched; the flip itself is a single-file ``os.replace``."""
    os.makedirs(base_dir, exist_ok=True)
    prev = _current_version(base_dir)
    n = int(os.path.basename(prev)[1:]) if prev else -1
    name = f"v{n + 1}"
    df.write.mode("overwrite").parquet(os.path.join(base_dir, name))
    ptr = os.path.join(base_dir, _CURRENT)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(name)
    os.replace(tmp, ptr)
    for entry in os.listdir(base_dir):
        if entry.startswith("v") and entry != name:
            shutil.rmtree(os.path.join(base_dir, entry), ignore_errors=True)


def fold_batch(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_dir: str,
    priority_sources: list[str],
) -> None:
    """Fold one node-delta batch into the versioned snapshot. Safe to
    call again with the same batch — the fold is idempotent."""
    if not batch.take(1):
        return
    snapshot = read_snapshot(spark, snapshot_dir)
    if snapshot is not None:
        new_snap = nodes_merge_incremental(
            snapshot, batch, priority_sources, sort_output=False
        )
    else:
        new_snap = nodes_merge_with_state(
            batch, priority_sources, sort_output=False
        )
    _publish(new_snap, snapshot_dir)


def fold_edges_batch(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_dir: str,
) -> None:
    """Edge twin of :func:`fold_batch`: fold one raw edge delta into the
    provenance-merged (s,p,o) snapshot. Same guarantees — idempotent
    (set-union payloads), crash-safe versioned publish, O(delta) per
    batch with the snapshot never shuffled."""
    if not batch.take(1):
        return
    snapshot = read_snapshot(spark, snapshot_dir)
    if snapshot is not None:
        new_snap = edges_merge_incremental(snapshot, batch, sort_output=False)
    else:
        new_snap = edges_merge_provenance(batch, sort_output=False)
    _publish(new_snap, snapshot_dir)


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
