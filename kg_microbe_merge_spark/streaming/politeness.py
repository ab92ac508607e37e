"""Stateful per-host politeness rate limiting for a streaming crawl
frontier (``applyInPandasWithState``).

``operators/frontier.fetch_schedule`` plans politeness waves over a
BATCH frontier; a live crawl is a stream — discovered URLs arrive
continuously and the fetcher must still respect a per-host budget per
scheduling tick. This operator keys the candidate stream by host and
keeps, per host, a bounded priority BACKLOG in the streaming state
store (checkpointed with the query):

* per micro-batch, incoming candidates merge with the host's backlog,
  the top ``per_batch`` by (priority DESC, url ASC) are emitted with
  their within-wave slot and a per-host ``wave`` counter (the tick
  number, monotone per host — THE politeness unit: ≤ ``per_batch``
  rows per (host, wave)), and the remainder is carried forward;
* a host with leftover backlog arms a ``drain_delay_ms``
  processing-time timeout, so a later trigger drains its next budget
  even when no new candidate arrives for it — without this,
  applyInPandasWithState never re-invokes quiet keys and the backlog
  would starve. In production ``drain_delay_ms`` is the crawl delay
  and the query runs a processing-time trigger, draining one budget
  per trigger. (Caveat, measured on Spark 4.1: configuring
  ProcessingTimeTimeout makes ``trigger(availableNow=True)`` run
  empty micro-batches indefinitely instead of terminating — Spark
  must keep scheduling batches to honor potential timeouts — so
  drain-to-empty jobs should use a processing-time trigger and stop
  on quiescence, as the tests do);
* the backlog is capped at ``max_backlog`` (lowest-priority overflow
  is dropped, counted, and the running drop total rides along on every
  emitted row as ``dropped_so_far`` — silent truncation would read as
  "scheduled everything" when it didn't);
* emission is deterministic given the micro-batch division (no clocks,
  no RNG), so tests replay exact expectations, and a restart resumes
  from the checkpointed backlog.

State size honesty: state per host is ≤ ``max_backlog`` (priority,
url) pairs — the cap is the contract; a production deployment sizes it
to the fetch budget horizon (backlog beyond what the fetcher can reach
before recrawl is dead weight by definition).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("priority", T.LongType()),
        T.StructField("wave", T.LongType()),
        T.StructField("slot", T.LongType()),
        T.StructField("backlog_after", T.LongType()),
        T.StructField("dropped_so_far", T.LongType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("urls", T.ArrayType(T.StringType())),
        T.StructField("prios", T.ArrayType(T.LongType())),
        T.StructField("dropped", T.LongType()),
        T.StructField("wave", T.LongType()),
    ]
)


def _make_limiter(per_batch: int, max_backlog: int, drain_delay_ms: int):
    def _fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            urls, prios, dropped, wave = state.get
            pool = {u: int(p) for u, p in zip(urls, prios)}
            dropped, wave = int(dropped), int(wave)
        else:
            pool, dropped, wave = {}, 0, 0
        for pdf in pdfs:
            for u, p in zip(pdf["url"], pdf["priority"]):
                # a re-discovered url keeps its best priority
                u, p = str(u), int(p)
                if u not in pool or p > pool[u]:
                    pool[u] = p
        ranked = sorted(pool.items(), key=lambda t: (-t[1], t[0]))
        emit = ranked[:per_batch]
        backlog = ranked[per_batch : per_batch + max_backlog]
        dropped += max(0, len(ranked) - per_batch - max_backlog)
        if emit:
            yield pd.DataFrame(
                {
                    "host": [host] * len(emit),
                    "url": [u for u, _p in emit],
                    "priority": [p for _u, p in emit],
                    "wave": [wave] * len(emit),
                    "slot": list(range(len(emit))),
                    "backlog_after": [len(backlog)] * len(emit),
                    "dropped_so_far": [dropped] * len(emit),
                }
            )
            wave += 1
        state.update(
            (
                [u for u, _p in backlog],
                [p for _u, p in backlog],
                dropped,
                wave,
            )
        )
        if backlog:
            # re-arm: drain the next budget on a later trigger even
            # if no new candidate arrives for this host
            state.setTimeoutDuration(drain_delay_ms)

    return _fn


def rate_limited_fetch_stream(
    frontier_stream: DataFrame,
    per_batch: int = 4,
    max_backlog: int = 10_000,
    drain_delay_ms: int = 1,
    url_col: str = "url",
    priority_col: str = "priority",
) -> DataFrame:
    """Candidate stream (url, priority) → politeness-limited fetch
    orders: per host, at most ``per_batch`` rows per wave, highest
    priority first, the rest carried in checkpointed state and drained
    one budget per ``drain_delay_ms``. Host comes from the shared
    frontier host parser. A url re-discovered after it was emitted is
    scheduled again (recrawl); pre-filter with the frontier dedup
    operator when refetch is unwanted."""
    if per_batch < 1:
        raise ValueError(f"per_batch must be >= 1, got {per_batch}")
    if max_backlog < 0:
        raise ValueError(f"max_backlog must be >= 0, got {max_backlog}")
    if drain_delay_ms < 1:
        raise ValueError(
            f"drain_delay_ms must be >= 1, got {drain_delay_ms}"
        )
    from ..functions.urls import url_host

    keyed = frontier_stream.select(
        url_host(F.col(url_col)).alias("host"),
        F.col(url_col).alias("url"),
        # NULL priority sorts as 0 (not a Python-side NaN crash)
        F.coalesce(F.col(priority_col).cast("long"), F.lit(0)).alias(
            "priority"
        ),
    ).filter(F.col("url").isNotNull() & (F.col("url") != ""))
    return keyed.groupBy("host").applyInPandasWithState(
        _make_limiter(per_batch, max_backlog, drain_delay_ms),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
