"""Watermarked stream-stream join — pages enriched with in-link
anchors as BOTH sides arrive continuously.

The batch pipeline joins the crawl's page table against the extracted
link graph (functions/links.py) in one shot; a continuously-crawling
pipeline sees pages and the anchors pointing at them arrive
INDEPENDENTLY and out of order. Structured Streaming's stream-stream
inner join holds both sides in the state store and emits a row the
moment the match arrives; the event-time watermarks plus the range
condition bound how long either side is retained, so state is
O(active window), not O(history).

Semantics: an anchor matches a page iff it names the page's url AND
its observation time is within ``max_skew`` of the page's fetch time
(anchors seen long before/after a fetch describe a different version
of the page). Both inputs carry event time; late rows past the
watermark are dropped.

One definition, two execution modes (the module convention): on batch
frames the same function is a plain inner join with the identical
range predicate — the tested invariant is *stream ≡ batch* for every
pair both watermarks have passed.

Scale: the join shuffles both streams once on the url key; per-key
state holds only rows inside the watermark+skew horizon (Spark evicts
below the combined watermark). Hub pages with many in-links are a
value-side fan-out, not a state blow-up — each anchor row leaves
state as soon as its horizon passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pages_with_anchors(
    pages: DataFrame,
    anchors: DataFrame,
    max_skew: str = "30 minutes",
    page_watermark: str = "1 hour",
    anchor_watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join ``pages (url, warc_ts, …)`` with
    ``anchors (dst_url, seen_ts, anchor_text, …)`` on url within
    ``±max_skew`` event time. Returns one row per (page, matching
    anchor) with both timestamps kept — aggregate downstream if one
    row per page is wanted (a second stateful stage)."""
    p = pages
    a = anchors
    if pages.isStreaming:
        p = pages.withWatermark("warc_ts", page_watermark)
    if anchors.isStreaming:
        a = anchors.withWatermark("seen_ts", anchor_watermark)
    skew = f"INTERVAL {max_skew}"
    cond = (
        (p["url"] == a["dst_url"])
        & (a["seen_ts"] >= F.expr(f"warc_ts - {skew}"))
        & (a["seen_ts"] <= F.expr(f"warc_ts + {skew}"))
    )
    return p.join(a, cond, "inner").select(
        p["url"],
        p["warc_ts"],
        a["seen_ts"],
        a["anchor_text"],
        F.col("src_url"),
    )
