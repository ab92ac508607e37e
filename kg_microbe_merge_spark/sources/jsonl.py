"""Resilient JSON-lines corpus ingestion with quarantine.

Web-scale crawl dumps are never clean: truncated lines, invalid UTF-8
escapes, schema drift. The reference ingests only trusted TSVs
(kg_microbe_merge/run.py download+transform path); a 100 TB pipeline
needs the malformed fraction SEPARATED, not dropped silently and not
failing the job.

Design: read as text and parse with ``from_json`` (JVM Jackson, one
row-local projection) instead of ``spark.read.json`` PERMISSIVE mode —
that sidesteps Spark's "queries referencing only the internal corrupt
record column are disallowed" restriction (which otherwise forces a
``cache()`` of the whole parsed relation to split valid from corrupt —
a non-starter at corpus scale). Each returned branch is ONE scan +
row-local parse + filter (no caching, no Exchange — plan-asserted);
Catalyst prunes the raw-line column out of the valid branch's plan.
A caller materializing BOTH branches pays two scans — at corpus scale
persist the valid output first and derive quarantine from the same
batch job, or write both from one pass with a ``reason``-partitioned
sink; the quarantine branch's scan is cheap relative to the corpus
only because malformed lines short-circuit the parse.

Quarantine rows keep the raw line, the source file, and a reason
(``malformed_json`` or ``missing:<field>``) — enough to re-drive the
fixed parser over ONLY the quarantine output later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl(
    spark: SparkSession,
    paths: list[str] | str,
    schema: StructType,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Parse JSON-lines files into ``(valid, quarantine)``.

    ``valid`` has exactly ``schema``'s columns; a row is valid iff the
    line parses as JSON AND every ``required`` field is non-null
    (fields merely missing from a parseable line are null — schema
    drift — and pass unless listed in ``required``).

    ``quarantine`` has (raw, source_file, reason); blank lines are
    ignored (not quarantined — trailing newlines are not data errors).
    """
    required = required or []
    names = {f.name for f in schema.fields}
    bad = set(required) - names
    if bad:
        raise ValueError(f"required fields not in schema: {sorted(bad)}")
    if "_corrupt" in names:
        raise ValueError("schema may not use the reserved name _corrupt")
    raw = (
        spark.read.text(paths)
        .filter(F.trim(F.col("value")) != "")
        .select(
            F.col("value").alias("raw"),
            F.input_file_name().alias("source_file"),
        )
    )
    # PERMISSIVE from_json yields an all-null struct for malformed
    # lines — indistinguishable from an all-null record. The corrupt
    # sentinel field disambiguates: Jackson fills it ONLY on parse
    # failure.
    parse_schema = StructType(
        list(schema.fields) + [StructField("_corrupt", StringType())]
    )
    parsed = raw.withColumn(
        "rec",
        F.from_json(
            "raw",
            parse_schema,
            {"columnNameOfCorruptRecord": "_corrupt", "mode": "PERMISSIVE"},
        ),
    )
    reason = F.when(
        F.col("rec").isNull() | F.col("rec")["_corrupt"].isNotNull(),
        F.lit("malformed_json"),
    )
    for name in required:
        reason = reason.when(
            F.col("rec")[name].isNull(), F.lit(f"missing:{name}")
        )
    parsed = parsed.withColumn("reason", reason)
    valid = (
        parsed.filter(F.col("reason").isNull())
        .select("rec.*")
        .drop("_corrupt")
    )
    quarantine = parsed.filter(F.col("reason").isNotNull()).select(
        "raw", "source_file", "reason"
    )
    return valid, quarantine
