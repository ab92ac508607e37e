"""PMI collocation mining — statistically-bound phrase discovery.

The phrase-mining half of tokenizer construction (operators/vocab.py
counts candidate BPE pairs by raw frequency; this module scores them by
ASSOCIATION): pointwise mutual information ranks adjacent token pairs
that co-occur far more than their unigram frequencies predict — "new
york", "et al" — while demoting frequent-but-independent pairs ("of
the"). The standard corpus-linguistics recipe (Church & Hanks 1990),
with the normalized variant (NPMI, Bouma 2009) that maps scores to
≈[-1, 1] so thresholds transfer across corpus sizes (the bound is
asymptotic under the slot-stream unigram counts below: doc-edge slots
can push a never-apart pair slightly above 1 on a small corpus):

    pmi(x, y)  = ln( p(x,y) / (p(x)·p(y)) )
               = ln( c_xy · N_u² / (N_b · c_x · c_y) )
    npmi(x, y) = pmi(x, y) / ln( N_b / c_xy )

where ``c_xy`` counts adjacent-pair instances (N_b total) and ``c_x``
counts occurrences over the bigram-SLOT stream (each instance's w1 and
w2; N_u = 2·N_b total) — reusing the one instance relation instead of
a second token-explode pass. Interior tokens count ~2× their raw
frequency, but a uniform scale factor cancels exactly in the PMI ratio
(c→2c, N→2N leaves c_xy·N² / (N_b·c_x·c_y) unchanged); only doc-edge
tokens deviate, by 1 per document occurrence.

Shape at scale (the bigram_lm precedent, operators/ngram_lm.py):

- pair and token instances are produced ROW-LOCALLY from one
  tokenize-once projection (two slices + arrays_zip — no pre-explode
  exchange); counts are one partially-aggregated ``groupBy`` each, so
  the Zipf head collapses map-side before either shuffle;
- ``min_count`` prunes the pair table BEFORE any join — at web scale
  the hapax tail IS the pair table (Zipf: most pairs occur once), so
  the two unigram joins see only the vocabulary-bounded survivors;
- the unigram table is vocabulary-bounded (sublinear in corpus size)
  and joins broadcast in practice; at unbounded vocab they degrade to
  shuffle joins on the keys the count aggregation just produced;
- the two corpus totals are one tiny global aggregation, inlined as
  literals into the scoring expression (zero-shuffle scoring);
- top-k is a bounded ``TakeOrderedAndProject`` on the deterministic
  total order (npmi desc, w1 asc, w2 asc) — never a global sort.

Cross-engine protocol: counts and totals are exact BIGINTs; the score
ratio is built from them in ONE fixed operand order mirrored verbatim
in the DuckDB twin, passed through ``ln`` (transcendental parity per
the tfidf/bm25/ngram_lm precedent), and snapped to micro ints with
``floor(x·1e6 + 0.5)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.operators.ngram_lm import bigram_instances


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` adjacent-pair collocations by NPMI:
    ``(w1, w2, n_pair, n_w1, n_w2, pmi_micro, npmi_micro)``.

    ``min_count`` drops pairs with fewer instances before scoring
    (both a scale requirement — see module docstring — and the
    standard PMI hygiene: hapax pairs otherwise dominate the ranking
    with pmi = ln(N_u²/(N_b·c_x·c_y)) noise).
    """
    inst = (
        df.select(F.lit(0).alias("_pmi_doc"), text_col)
        .transform(
            lambda d: bigram_instances(d, text_col=text_col, id_col="_pmi_doc")
        )
        .select("w1", "w2")
        .persist()
    )

    # both count tables are vocabulary-bounded — materialize them
    # (eager localCheckpoint) so the instance cache can be released
    # before the caller's final evaluation (on a real cluster: write
    # the model tables, the bigram_model persist note)
    cb = (
        inst.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    ).localCheckpoint(eager=True)
    cu = (
        inst.select(F.col("w1").alias("w"))
        .union(inst.select(F.col("w2").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    ).localCheckpoint(eager=True)
    n_b = int(inst.count())
    inst.unpersist()
    # every instance contributes exactly its w1 and w2 slot, so the
    # slot-stream unigram total is identically 2·N_b — no second job
    n_u = 2 * n_b

    j = (
        cb.join(cu.withColumnRenamed("w", "w1").withColumnRenamed("n_w", "n_w1"), "w1")
        .join(cu.withColumnRenamed("w", "w2").withColumnRenamed("n_w", "n_w2"), "w2")
    )
    # fixed operand order, mirrored in the SQL twin
    ratio = (
        F.col("n_pair").cast("double")
        * F.lit(float(n_u))
        * F.lit(float(n_u))
    ) / (
        F.lit(float(n_b))
        * F.col("n_w1").cast("double")
        * F.col("n_w2").cast("double")
    )
    pmi = F.log(ratio)
    denom = F.log(F.lit(float(n_b)) / F.col("n_pair").cast("double"))
    pmi_micro = F.floor(pmi * F.lit(1e6) + F.lit(0.5)).cast("long")
    # degenerate denominator: a pair accounting for EVERY bigram
    # instance has -ln p(xy) = 0; the always-co-occur convention is
    # npmi = 1 (mirrored in the SQL and python twins)
    npmi_micro = F.when(
        F.col("n_pair") == F.lit(n_b), F.lit(1_000_000).cast("long")
    ).otherwise(
        F.floor(pmi / denom * F.lit(1e6) + F.lit(0.5)).cast("long")
    )
    out = j.select(
        "w1",
        "w2",
        F.col("n_pair").cast("long").alias("n_pair"),
        F.col("n_w1").cast("long").alias("n_w1"),
        F.col("n_w2").cast("long").alias("n_w2"),
        pmi_micro.alias("pmi_micro"),
        npmi_micro.alias("npmi_micro"),
    )
    return out.orderBy(
        F.desc("npmi_micro"), F.asc("w1"), F.asc("w2")
    ).limit(top_k)


def pmi_collocations_sql(
    toks_sql: str, min_count: int = 5, top_k: int = 100
) -> str:
    """DuckDB twin of :func:`pmi_collocations` over a token-array query
    ``toks_sql`` producing ``(t)`` (one row per document, pre-filtered
    to non-empty tokens) — generated here so the operand order of the
    score expression cannot drift from the Spark plan."""
    ratio = (
        "(cb.n_pair::DOUBLE * t2.nu::DOUBLE * t2.nu::DOUBLE)"
        " / (t2.nb::DOUBLE * u1.n_w::DOUBLE * u2.n_w::DOUBLE)"
    )
    denom = "ln(t2.nb::DOUBLE / cb.n_pair::DOUBLE)"
    return f"""
        WITH toks AS ({toks_sql}),
        idx AS (SELECT t, unnest(range(1, len(t))) AS i FROM toks),
        inst AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM idx),
        cb AS (SELECT w1, w2, count(*) AS n_pair FROM inst
               GROUP BY w1, w2 HAVING count(*) >= {min_count}),
        cu AS (SELECT w, count(*) AS n_w FROM (
                   SELECT w1 AS w FROM inst
                   UNION ALL SELECT w2 FROM inst) GROUP BY w),
        t2 AS (SELECT (SELECT count(*) FROM inst) AS nb,
                      (SELECT sum(n_w) FROM cu) AS nu)
        SELECT cb.w1, cb.w2,
               cast(cb.n_pair AS BIGINT) AS n_pair,
               cast(u1.n_w AS BIGINT) AS n_w1,
               cast(u2.n_w AS BIGINT) AS n_w2,
               floor(ln({ratio}) * 1e6 + 0.5)::BIGINT AS pmi_micro,
               CASE WHEN cb.n_pair = t2.nb THEN 1000000::BIGINT
                    ELSE floor(ln({ratio}) / {denom} * 1e6 + 0.5)::BIGINT
               END AS npmi_micro
        FROM cb
        JOIN cu u1 ON u1.w = cb.w1
        JOIN cu u2 ON u2.w = cb.w2
        CROSS JOIN t2
        ORDER BY npmi_micro DESC, cb.w1 ASC, cb.w2 ASC
        LIMIT {top_k}
    """


def pmi_py(docs: list[str], min_count: int = 5, top_k: int = 100):
    """Python twin (tests): same normalization, counts, operand order,
    micro protocol."""
    import math
    import re
    from collections import Counter

    cb: Counter = Counter()
    cu: Counter = Counter()
    nb = 0
    for text in docs:
        toks = [
            t
            for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ")
            if t
        ]
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] += 1
            cu[a] += 1
            cu[b] += 1
            nb += 1
    nu = sum(cu.values())
    rows = []
    for (a, b), n_pair in cb.items():
        if n_pair < min_count:
            continue
        ratio = (float(n_pair) * float(nu) * float(nu)) / (
            float(nb) * float(cu[a]) * float(cu[b])
        )
        pmi = math.log(ratio)
        if n_pair == nb:
            npmi_micro = 1_000_000
        else:
            denom = math.log(float(nb) / float(n_pair))
            npmi_micro = math.floor(pmi / denom * 1e6 + 0.5)
        rows.append(
            (
                a,
                b,
                n_pair,
                cu[a],
                cu[b],
                math.floor(pmi * 1e6 + 0.5),
                npmi_micro,
            )
        )
    rows.sort(key=lambda r: (-r[6], r[0], r[1]))
    return rows[:top_k]
