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


def triples_from_corpus(
    corpus: DataFrame,
    lang: str | None = "en",
    url_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Fused corpus → exploded triples: html text extraction + SVO
    extraction in ONE Arrow round trip.

    Semantically identical to ``with_extracted_text`` →
    ``filter(lang)`` → ``with_triples`` (same pure functions
    :func:`~..extract.extract_text_py` / :func:`extract_triples_py`
    per row — pytest asserts exact equality), but the plan shape is
    what scales: the two chained pandas UDFs of the unfused path are
    two ArrowEvalPython hops, each serializing the full document text
    JVM→Python→JVM; this single ``mapInPandas`` stage crosses Arrow
    once with (url, html) in and only the triple rows out (orders of
    magnitude smaller than the text), and the language filter runs
    JVM-side BEFORE the hop — pushed into the parquet scan, so
    non-target-language html is never decoded, transferred, or
    extracted. Measured on the 4 M-doc scaling corpus this removes an
    entire encode/decode of the text column per document and the
    per-hop worker synchronization stalls that showed up as idle HW
    threads at local[32].

    Rows that already carry non-null ``text`` keep it (same input
    contract as ``with_extracted_text``); the iterator form amortizes
    regex/parser setup across all batches of a partition.

    Output: (url, subj, pred, obj, conf) — documents with no triples
    produce no rows (inner-explode semantics).
    """
    from collections.abc import Iterator

    from .extract import extract_text_py

    has_text = text_col in corpus.columns
    cols = [url_col, html_col] + ([text_col] if has_text else [])
    src = corpus
    if lang is not None and lang_col in corpus.columns:
        src = src.filter(F.col(lang_col) == lang)
    src = src.select(*cols)

    out_schema = T.StructType(
        [
            T.StructField(url_col, T.StringType()),
            T.StructField("subj", T.StringType()),
            T.StructField("pred", T.StringType()),
            T.StructField("obj", T.StringType()),
            T.StructField("conf", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            subjs: list[str] = []
            preds: list[str] = []
            objs: list[str] = []
            confs: list[float] = []
            htmls = pdf[html_col]
            texts = pdf[text_col] if has_text else None
            for i, u in enumerate(pdf[url_col]):
                t = texts.iloc[i] if texts is not None else None
                if t is None:
                    t = extract_text_py(htmls.iloc[i])
                for s, p, o, c in extract_triples_py(t):
                    urls.append(u)
                    subjs.append(s)
                    preds.append(p)
                    objs.append(o)
                    confs.append(c)
            yield pd.DataFrame(
                {
                    url_col: urls,
                    "subj": subjs,
                    "pred": preds,
                    "obj": objs,
                    "conf": confs,
                }
            )

    return src.mapInPandas(gen, out_schema)


def triples_from_corpus_jvm(
    corpus: DataFrame,
    lang: str | None = "en",
    url_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Zero-Python twin of :func:`triples_from_corpus` — same output
    rows (pytest-proven identical on the scaling corpus AND on
    adversarial out-of-class html), different physical plan.

    Rows whose html falls inside the whitelisted plain-tag class
    (:func:`~..extract.jvm_extract_eligible`) run entirely as Catalyst
    expressions: cast → skip-container removal → block marking → tag
    strip → whitespace normalization → SVO ``regexp_extract_all``.
    Rows OUTSIDE the class (or with pre-populated ``text``) are
    resolved by the Arrow reference UDF, fed a NULL-MASKED html column
    in the same single pass — the ArrowEvalPython node runs over all
    rows but its batches carry bytes only for the rare out-of-class
    documents, so correctness never depends on the regex twin handling
    the open html grammar while eligible documents never cross Arrow.
    At 100 TB this removes two full copies of every eligible document
    (JVM→Arrow→Python) from the memory-bandwidth budget.
    """
    from ..functions.extract import (
        extract_text_udf,
        jvm_extract_eligible_pre,
        jvm_extract_text_pre,
        jvm_no_skip,
    )

    has_text = text_col in corpus.columns
    src = corpus
    if lang is not None and lang_col in corpus.columns:
        src = src.filter(F.col(lang_col) == lang)

    # Single-pass text resolution (one scan, no union; the expensive
    # skip-container removal runs ONCE via an explicit intermediate
    # column — Catalyst does not CSE identical regex subtrees):
    #   1. pre-populated text wins (input contract),
    #   2. class-eligible html extracts JVM-side,
    #   3. everything else goes to the Arrow reference UDF — fed a
    #      NULL-masked html column, so the Arrow batch carries bytes
    #      ONLY for the rare out-of-class rows (nulls are ~free) even
    #      though the ArrowEvalPython node runs over every row.
    with_noskip = src.withColumn("_noskip", jvm_no_skip(F.col(html_col)))
    eligible = jvm_extract_eligible_pre(F.col(html_col), F.col("_noskip"))
    pre_text = F.col(text_col) if has_text else F.lit(None).cast("string")
    need_py = pre_text.isNull() & ~F.coalesce(eligible, F.lit(False))
    full_text = F.coalesce(
        pre_text,
        F.when(eligible, jvm_extract_text_pre(F.col("_noskip"))),
        extract_text_udf(F.when(need_py, F.col(html_col))),
    )

    # SVO is ALWAYS JVM: its equivalence with extract_triples_py does
    # not depend on the html class (same pattern string, (?U) Unicode
    # \s, identical leftmost non-overlapping semantics; fuzz-proven in
    # tests/test_extract_jvm.py over out-of-class documents too).
    return (
        with_noskip.select(F.col(url_col), full_text.alias("_text"))
        .select(
            url_col,
            F.explode(
                F.regexp_extract_all(F.col("_text"), F.lit(_JVM_SVO_PAT), 0)
            ).alias("_m"),
        )
        .select(
            url_col,
            F.regexp_extract(F.col("_m"), _JVM_SVO_PAT, 1).alias("subj"),
            F.translate(
                F.regexp_extract(F.col("_m"), _JVM_SVO_PAT, 2), " ", "_"
            ).alias("pred"),
            F.regexp_extract(F.col("_m"), _JVM_SVO_PAT, 3).alias("obj"),
            F.lit(1.0).alias("conf"),
        )
        .filter(
            ~F.lower(F.col("subj")).isin(*STOPWORDS)
            & ~F.lower(F.col("obj")).isin(*STOPWORDS)
        )
    )


# (?U): Java \s matches Python's Unicode \s. Same pattern string as
# _TRIPLE_RE; leftmost non-overlapping matches in both engines.
_JVM_SVO_PAT = rf"(?U)({_ENTITY_RE})\s+({_VERB_ALT})\s+({_ENTITY_RE})"


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
