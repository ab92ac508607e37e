"""Z-order layout (operators/layout.py): the Morton interleave matches
a python twin bit-for-bit, bucketize clamps correctly, and a z-ordered
parquet write leaves TIGHT per-file min/max footer ranges on every
interleaved dimension (the data-skipping evidence)."""

from __future__ import annotations

import glob
import random

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.layout import (
    bucketize,
    write_zordered,
    z_value,
    z_value_sql,
)


def py_z(vals: list[int], bits: int) -> int:
    out = 0
    for i, x in enumerate(vals):
        for b in range(bits):
            out |= ((x >> b) & 1) << (b * len(vals) + i)
    return out


def test_z_value_matches_python_twin(spark):
    rng = random.Random(4)
    rows = [
        (i, rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "i long, a long, b long, c long")
    for cols in (["a"], ["a", "b"], ["a", "b", "c"]):
        got = {
            r["i"]: r["z"]
            for r in df.select(
                "i", z_value([F.col(c) for c in cols], bits=8).alias("z")
            ).collect()
        }
        want = {
            row[0]: py_z([row[1 + "abc".index(c)] for c in cols], 8)
            for row in rows
        }
        assert got == want, cols


def test_z_value_sql_twin(spark):
    import duckdb

    rng = random.Random(9)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(64)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = z_value_sql(["a", "b"], bits=16)
    got = [r[0] for r in con.execute(f"SELECT {sql} FROM t").fetchall()]
    assert got == [py_z(list(r), 16) for r in rows]


def test_bucketize_bounds(spark):
    df = spark.createDataFrame(
        [(x,) for x in (-5.0, 0.0, 31.9, 32.0, 255.9, 256.0, 999.0)],
        "x double",
    )
    got = [
        r["b"]
        for r in df.select(
            bucketize(F.col("x"), 0.0, 256.0, 3).alias("b")
        ).collect()
    ]
    # width = 32; clamped to [0, 7]
    assert got == [0, 0, 0, 1, 7, 7, 7]


def _file_spans(path: str, col: str) -> list[tuple]:
    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        spans.append((lo, hi))
    return spans


def test_zordered_write_tightens_file_stats(spark, tmp_path):
    rng = random.Random(17)
    rows = [
        (rng.randrange(256), rng.randrange(256), float(i))
        for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "u long, v long, payload double")
    z = z_value([F.col("u"), F.col("v")], bits=8)

    zpath = str(tmp_path / "zorder")
    write_zordered(df, z, zpath, num_files=16)
    npath = str(tmp_path / "naive")
    df.repartition(16).write.parquet(npath)

    total = spark.read.parquet(zpath).count()
    assert total == 20000  # lossless

    for col in ("u", "v"):
        spans = _file_spans(zpath, col)
        assert len(spans) >= 8
        mean_frac = sum(hi - lo for lo, hi in spans) / len(spans) / 255.0
        # a 16-file Z-layout over an 8+8-bit grid covers ~quarter-range
        # tiles per dimension; naive hash layout covers ~full range
        assert mean_frac < 0.5, (col, mean_frac)
        naive_frac = (
            sum(hi - lo for lo, hi in _file_spans(npath, col))
            / len(_file_spans(npath, col))
            / 255.0
        )
        assert naive_frac > 0.9, (col, naive_frac)
