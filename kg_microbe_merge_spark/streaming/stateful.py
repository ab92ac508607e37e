"""Custom stateful streaming operator: cross-batch URL dedup via
``applyInPandasWithState``.

A continuous crawl re-sees urls (recrawls, mirrors, duplicate sitemap
entries). The parquet file sink is exactly-once per *file*, but the
crawl itself emits duplicate *rows* across micro-batches — deduping them
needs state that survives batches and restarts. This operator keys the
stream by a url-hash shard and keeps, per shard, the set of url hashes
already emitted (in the streaming state store, checkpointed with the
query): a row passes through exactly once across the lifetime of the
checkpoint.

State size note (100 TB honesty): state per shard grows with distinct
urls. At real crawl scale you would cap it with a TTL (GroupStateTimeout)
or swap the exact set for a Bloom filter serialized into the same state
row — the operator shape (grouped, Arrow-batched, state store) stays
identical. The exact-set variant here is the correctness reference.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_SHARDS_DEFAULT = 64

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.LongType()))]
)


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[int] = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        fresh_mask = []
        for h in pdf["url_hash"]:
            h = int(h)
            if h in seen:
                fresh_mask.append(False)
            else:
                seen.add(h)
                fresh_mask.append(True)
        out = pdf.loc[fresh_mask, ["url", "warc_ts", "lang"]]
        if len(out):
            yield out
    state.update((list(seen),))


def dedup_stream_by_url(
    corpus_stream: DataFrame, n_shards: int = N_SHARDS_DEFAULT
) -> DataFrame:
    """corpus stream → first-seen-only corpus rows (url, warc_ts, lang).

    Sharding by ``xxhash64(url) % n_shards`` bounds each state-store
    partition; the hash (not the url) is what the state keeps — 8 bytes
    per distinct url.
    """
    hashed = corpus_stream.select(
        "url",
        "warc_ts",
        "lang",
        F.xxhash64("url").alias("url_hash"),
        F.pmod(F.xxhash64("url"), F.lit(n_shards)).alias("shard"),
    )
    return hashed.groupBy("shard").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
