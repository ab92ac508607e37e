"""Shuffle-skew diagnostics (operators/skew.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from kg_microbe_merge_spark.operators.skew import (
    skew_report,
    skew_report_py,
)


def _df(spark, keys):
    return spark.createDataFrame([Row(k=str(x)) for x in keys])


def _collect(spark, keys, parts, top_n=20):
    return [
        tuple(r)
        for r in skew_report(
            _df(spark, keys), "k", shuffle_partitions=parts, top_n=top_n
        ).collect()
    ]


def test_matches_python_twin_on_zipf_keys(spark):
    rng = random.Random(3)
    keys = []
    for i in range(1, 60):
        keys += [f"key{i}"] * max(1, int(600 / i))
    rng.shuffle(keys)
    got = _collect(spark, keys, parts=32, top_n=15)
    assert got == skew_report_py(keys, 32, top_n=15)


def test_uniform_keys_need_no_salt(spark):
    keys = [f"k{i % 64}" for i in range(6400)]  # 100 rows each
    rows = _collect(spark, keys, parts=32)
    # max_freq * parts / total = 100*32/6400 = 0.5 -> balanced
    for r in rows:
        assert r[6] == 1                      # suggested_salt_buckets
        assert r[5] == 500_000                # concentration_micro

def test_hot_key_prescription(spark):
    # one key owns 90% of rows: at 10 partitions the uniform share is
    # total/10, so the hot key needs ceil(0.9 * 10) = 9 buckets
    keys = ["hot"] * 900 + [f"c{i}" for i in range(100)]
    rows = _collect(spark, keys, parts=10, top_n=1)
    (key, freq, total, distinct, mx, conc, buckets) = rows[0]
    assert (key, freq, total, distinct, mx) == ("hot", 900, 1000, 101, 900)
    assert buckets == 9
    assert conc == 9_000_000  # top reducer does 9x the uniform share


def test_invalid_partitions_rejected(spark):
    with pytest.raises(ValueError):
        skew_report(_df(spark, ["a"]), "k", shuffle_partitions=0)
