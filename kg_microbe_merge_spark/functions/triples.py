"""OpenIE-style (subject, predicate, object) triple extraction.

Two implementations, same semantics:

1. :func:`extract_triples_py` — pure single-threaded Python: THE
   reference implementation for the P/R ≥ 0.95 target (our deterministic
   stand-in for the reference pipeline's emitted triples, cf.
   BASELINE.json north_star).
2. :func:`extract_triples_udf` — Arrow-batched pandas UDF returning
   ``array<struct<subj,pred,obj,conf>>`` which callers ``explode`` —
   the UDTF-shaped distributed path (no per-row Python; one Python
   invocation per Arrow batch).

A third, fully JVM-side variant :func:`extract_triples_regexp` uses
``F.regexp_extract_all`` for the simple word-pattern grammar — zero
Python in the hot path; used for the driver-testdata ``documents`` table
where tokens are single lowercase words.

Grammar: sentences are split on '.', predicates come from a closed verb
lexicon (multi-word verbs allowed), subject/object are capitalized
entity tokens (``Xyz_abc`` style); stopword subjects/objects are
rejected (stopword-filter concept from the reference's unused
stopwords.yaml lexicon — list re-derived, not copied).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Closed predicate lexicon for the synthetic web corpus (multi-word ok).
VERB_LEXICON = [
    "produces",
    "consumes",
    "inhibits",
    "degrades",
    "is found in",
    "interacts with",
    "binds",
    "regulates",
]

# Minimal English stopword set for subject/object rejection (own list).
STOPWORDS = frozenset(
    """a an and are as at be by for from has have in is it its of on or that
    the this to was were will with not no which who whom these those then
    than but if so such very can could should would may might must do does
    did done being been""".split()
)

_ENTITY_RE = r"[A-Z][A-Za-z0-9_]*"
_VERB_ALT = "|".join(sorted((re.escape(v) for v in VERB_LEXICON), key=len, reverse=True))
_TRIPLE_RE = re.compile(rf"({_ENTITY_RE})\s+({_VERB_ALT})\s+({_ENTITY_RE})")

TRIPLE_STRUCT = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("conf", T.DoubleType()),
    ]
)


def extract_triples_py(text: str | None) -> list[tuple[str, str, str, float]]:
    """Pure, deterministic SVO extraction — the P/R reference.

    Single ``finditer`` pass over the whole document: a sentence-split
    pre-pass is provably redundant for this grammar (the entity class
    excludes '.', and the ``\\s+``-separated verb alternation contains
    no '.', so no match can cross a sentence boundary) and costs a full
    extra regex scan per document."""
    if not text:
        return []
    out: list[tuple[str, str, str, float]] = []
    for m in _TRIPLE_RE.finditer(text):
        s, v, o = m.group(1), m.group(2), m.group(3)
        if s.lower() in STOPWORDS or o.lower() in STOPWORDS:
            continue
        out.append((s, v.replace(" ", "_"), o, 1.0))
    return out


@F.pandas_udf(T.ArrayType(TRIPLE_STRUCT))
def extract_triples_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched wrapper over :func:`extract_triples_py`."""
    return text.map(
        lambda t: [
            {"subj": s, "pred": p, "obj": o, "conf": c}
            for (s, p, o, c) in extract_triples_py(t)
        ]
    )


def with_triples(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Engine stage: text → exploded triple rows. Rows with no triples
    are dropped (inner explode) — the downstream graph only sees
    documents that assert something."""
    return (
        df.withColumn("_triples", extract_triples_udf(F.col(text_col)))
        .withColumn("triple", F.explode("_triples"))
        .drop("_triples")
        .select(
            *df.columns,
            F.col("triple.subj").alias("subj"),
            F.col("triple.pred").alias("pred"),
            F.col("triple.obj").alias("obj"),
            F.col("triple.conf").alias("conf"),
        )
    )


def extract_triples_regexp(
    df: DataFrame,
    verbs: list[str],
    text_col: str = "text",
    stop: list[str] = ("a", "the"),
) -> DataFrame:
    """Fully JVM-side SVO extraction over single-word-token text via
    ``regexp_extract_all`` (non-overlapping matches, same semantics as
    ``re.finditer``) — zero Python; whole-stage-codegen friendly.

    Output columns: all input columns + (subj, pred, obj).
    """
    alt = "|".join(sorted(verbs, key=len, reverse=True))
    pat = rf"(\w+) ({alt}) (\w+)"
    matches = F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
    out = (
        df.withColumn("_m", F.explode(matches))
        .withColumn("subj", F.split(F.col("_m"), " ").getItem(0))
        .withColumn("pred", F.split(F.col("_m"), " ").getItem(1))
        .withColumn("obj", F.split(F.col("_m"), " ").getItem(2))
        .drop("_m")
    )
    stop_arr = list(stop)
    return out.filter(
        ~F.col("subj").isin(stop_arr) & ~F.col("obj").isin(stop_arr)
    )
