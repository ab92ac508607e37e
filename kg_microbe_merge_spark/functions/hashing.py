"""Portable deterministic hashing shared by Spark and the DuckDB oracle.

The approximate-dedup family (MinHash, SimHash, banded LSH) needs hash
values that BOTH engines can reproduce bit-for-bit, so the driver's
DuckDB gate can verify the full pipeline value-for-value instead of the
weaker rows-only check. ``xxhash64`` (Spark) has no DuckDB twin; ``md5``
exists in both. We derive a 60-bit non-negative integer from the first
15 hex chars of the md5 digest:

* Spark:  ``conv(substring(md5(x), 1, 15), 16, 10)`` cast to long
* DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``
* Python: ``int(hashlib.md5(x).hexdigest()[:15], 16)``

15 hex chars = 60 bits < 2^63, so the value is representable as a
signed BIGINT in both engines with no overflow/sign ambiguity. Seeded
variants append ``':<seed>'`` to the input before hashing.

Scale note: JVM md5 over short strings is a few × slower than xxhash64
but still tens of MB/s per core and fully inside whole-stage codegen —
hash cost is never the bottleneck next to the shuffle it feeds. Hot
paths that don't need oracle parity can pass ``F.xxhash64`` instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: divisor for mapping a 60-bit hash onto [0, 1)
HASH60_SPACE = 1 << 60


def hash60(col: Column) -> Column:
    """60-bit non-negative integer hash of a string column (md5-derived),
    reproducible in DuckDB via :func:`hash60_sql`."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_seeded(col: Column, seed: int | Column) -> Column:
    """Seeded 60-bit hash: hash60(x || ':' || seed). ``col`` may be any
    type castable to string (longs render as plain decimals in both
    engines)."""
    s = F.lit(seed) if isinstance(seed, int) else seed
    return hash60(F.concat_ws(":", col.cast("string"), s))


def hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash60` for an arbitrary SQL expression."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def hash60_seeded_sql(expr: str, seed: int) -> str:
    """DuckDB twin of :func:`hash60_seeded`."""
    return hash60_sql(f"({expr})::VARCHAR || ':{seed}'")


def hash60_py(value: str) -> int:
    """Python twin (for pandas-UDF code paths and tests)."""
    import hashlib

    return int(hashlib.md5(value.encode("utf-8")).hexdigest()[:15], 16)
