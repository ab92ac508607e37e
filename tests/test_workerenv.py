"""The mtime-aware zipimporter patch: skips the re-read when the archive
is unchanged, still re-reads when it changes, and is applied on the
Python workers (not just the driver)."""

from __future__ import annotations

import importlib
import os
import sys
import zipfile
import zipimport

import pandas as pd
import pytest

import kg_microbe_merge_spark  # noqa: F401  - applies the patch on import
from kg_microbe_merge_spark.workerenv import (
    patch_zipimporter_invalidate_caches,
)


def test_patch_is_applied_and_idempotent():
    assert getattr(
        zipimport.zipimporter.invalidate_caches, "_kg_mtime_aware", False
    )
    # second call is a no-op
    assert patch_zipimporter_invalidate_caches() is False


def _make_zip(path: str, payload: dict[str, str]) -> None:
    with zipfile.ZipFile(path, "w") as z:
        for name, body in payload.items():
            z.writestr(name, body)


def test_unchanged_archive_skips_reread(tmp_path):
    zp = str(tmp_path / "mod.zip")
    _make_zip(zp, {"m_one.py": "X = 1\n"})
    zi = zipimport.zipimporter(zp)
    files_before = zi._files
    zi.invalidate_caches()
    first = zi._files  # first call stamps + re-reads (no stamp yet)
    zi.invalidate_caches()
    zi.invalidate_caches()
    # unchanged archive: the directory dict object is NOT rebuilt
    assert zi._files is first
    assert files_before == first


def test_changed_archive_is_reread(tmp_path):
    zp = str(tmp_path / "mod.zip")
    _make_zip(zp, {"m_one.py": "X = 1\n"})
    zi = zipimport.zipimporter(zp)
    zi.invalidate_caches()
    _make_zip(zp, {"m_one.py": "X = 1\n", "m_two.py": "Y = 2\n"})
    # force an mtime difference even on coarse-granularity filesystems
    st = os.stat(zp)
    os.utime(zp, (st.st_atime, st.st_mtime + 2))
    zi.invalidate_caches()
    assert any("m_two.py" in k for k in zi._files)


def test_zip_import_still_works_after_patch(tmp_path):
    zp = str(tmp_path / "lib.zip")
    _make_zip(zp, {"kg_patch_probe_mod.py": "VALUE = 41\n"})
    sys.path.insert(0, zp)
    try:
        importlib.invalidate_caches()
        import kg_patch_probe_mod  # noqa: PLC0415

        assert kg_patch_probe_mod.VALUE == 41
    finally:
        sys.path.remove(zp)
        sys.modules.pop("kg_patch_probe_mod", None)
        importlib.invalidate_caches()


@pytest.mark.usefixtures()
def test_patch_reaches_python_workers(spark):
    """A worker that imports this package reports the patch active."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.BooleanType())
    def patched(s: pd.Series) -> pd.Series:
        import zipimport as _zi  # noqa: PLC0415

        import kg_microbe_merge_spark  # noqa: F401,PLC0415

        flag = getattr(
            _zi.zipimporter.invalidate_caches, "_kg_mtime_aware", False
        )
        return pd.Series([bool(flag)] * len(s))

    out = (
        spark.range(0, 8, 1, 4)
        .select(patched(F.col("id")).alias("ok"))
        .agg(F.min("ok").alias("all_ok"))
        .collect()[0]
        .all_ok
    )
    assert out is True
