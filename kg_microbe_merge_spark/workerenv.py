"""Python-worker environment repair: an mtime-aware
``zipimport.zipimporter.invalidate_caches``.

PySpark's worker loop calls ``importlib.invalidate_caches()`` once per
task (``pyspark/worker_util.py`` ``setup_spark_files``). On Python 3.11,
``zipimporter.invalidate_caches`` is UNCONDITIONAL — it re-reads the
whole zip central directory every call — and Spark puts ``pyspark.zip``
(3.5 MB, ~1000 entries) plus ``py4j-*-src.zip`` on every worker's
``sys.path``. The result is a fixed ~0.25 s of pure zip-directory
parsing **per task per worker**, measured with an in-worker stack
sampler on this box: 256 one-row pandas-UDF tasks on local[8] took
9.7 s, with >60 % of worker main-thread samples inside
``zipimport._read_directory``.

That per-task constant is invisible at partitions ≈ cores but makes
fine-grained partitioning (the thing that fixes wave raggedness and
stragglers at scale) pay a ~0.5 s/task tax across the pandas-UDF
stages, which at 4M docs turned a 93 s local[8] pipeline into 215 s
when the scan went from 11 to 256 splits.

Fix: wrap ``zipimporter.invalidate_caches`` so it only falls through to
the real re-read when the archive's (mtime, size) changed — the same
check newer CPython performs natively (the 3.11 behavior is simply the
pre-optimization code). Semantics are preserved: a genuinely updated
archive (new mtime or size) is still re-read; an untouched one is not.
With the patch the same 256-task job runs in 1.8 s (5.4×).

The patch is applied at package import time, so it lands on the driver
AND on every Python worker the moment a worker unpickles any UDF
defined in this package (unpickling imports the defining module, which
imports the package). It is idempotent and safe where pyspark itself is
only importable from the zip (real clusters): the zipimporter stays on
``sys.path`` and still serves imports — only the redundant per-task
directory re-read is skipped.
"""

from __future__ import annotations

import os
import zipimport

_STAMP_ATTR = "_kg_zip_stamp"


def patch_zipimporter_invalidate_caches() -> bool:
    """Install the mtime-aware wrapper. Returns True if newly installed,
    False if it was already in place (idempotent)."""
    zi = zipimport.zipimporter
    if getattr(zi.invalidate_caches, "_kg_mtime_aware", False):
        return False
    orig = zi.invalidate_caches

    def invalidate_caches(self):  # noqa: ANN001 - matches stdlib signature
        try:
            st = os.stat(self.archive)
            key = (st.st_mtime, st.st_size)
        except OSError:
            key = None
        if key is None or getattr(self, _STAMP_ATTR, None) != key:
            # archive changed (or unstat-able): defer to the real re-read
            try:
                setattr(self, _STAMP_ATTR, key)
            except AttributeError:
                pass  # exotic zipimporter subclass with __slots__
            orig(self)

    invalidate_caches._kg_mtime_aware = True  # type: ignore[attr-defined]
    invalidate_caches.__wrapped__ = orig  # type: ignore[attr-defined]
    zi.invalidate_caches = invalidate_caches  # type: ignore[method-assign]
    return True
