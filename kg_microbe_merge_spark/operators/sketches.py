"""Mergeable streaming sketches: HyperLogLog distinct counting and
Count-Min frequency estimation / heavy hitters.

At 10^12 documents, "how many distinct spans / urls / entities per
partition-of-interest" and "which spans/domains are heavy" are the
first questions every curation run asks, and the exact answers
(``count(distinct x)``, full ``groupBy(x).count()``) materialize a
shuffle proportional to the NUMBER OF DISTINCT ITEMS — at web scale
that is the corpus itself. Sketches bound that state:

* **HyperLogLog** (Flajolet et al. 2007): per group, ``m = 2^p``
  integer registers; the shuffle carries at most ``m`` rows per group
  regardless of cardinality (relative error ~= 1.04/sqrt(m)).
* **Count-Min** (Cormode & Muthukrishnan 2005): ``d x w`` integer
  counters; the shuffle carries at most ``d*w`` cells per map
  partition regardless of stream length (one-sided overestimate
  error <= stream_len * e / w at confidence 1 - e^-d).

Both are MERGEABLE semigroups (register-wise ``max`` / cell-wise
``sum``), which is the property that matters on a cluster: partial
sketches combine map-side, across partitions, across snapshots, and
across streaming micro-batches without re-reading data.

Cross-engine exactness (the repo's DuckDB value-hash gate): every
step is integer arithmetic over the portable md5-derived ``hash60``
(functions/hashing.py) — register index = top ``p`` bits, rank
rho = leading-zero count of the remaining bits via ``length(bin(w))``
(both engines render minimal binary strings), Count-Min rows use the
existing universal-hash family. The single floating-point step (the
HLL harmonic mean) is made order-independent and engine-exact by
summing ``2^(Rmax - rho)`` as BIGINTs (exact, commutative) and doing
ONE int64->double division at the end, then snapping to the repo's
floor(x*1e6 + 0.5) micro protocol.

Reference parity: the reference's DuckDB merge uses exact
``count(distinct ...)`` only (duckdb_utils.py aggregations); sketches
are the scale path this engine adds for the mandated training-data
pipeline (distinct-span audits, boilerplate heavy-hitter detection).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_merge_spark.functions.hashing import (
    hash60,
    hash60_seeded,
    hash60_sql,
    universal_slot,
    universal_slot_sql,
)

# --- HyperLogLog ----------------------------------------------------------

#: default precision: m = 512 registers, rel. error ~1.04/sqrt(512) = 4.6%
HLL_P = 9


def _hll_alpha(m: int) -> float:
    """Standard bias-correction constant (Flajolet et al., m >= 128)."""
    if m < 128:
        raise ValueError("hll precision below p=7 is not supported")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    item_col: str,
    group_cols: Sequence[str] = (),
    p: int = HLL_P,
) -> DataFrame:
    """Per-group HLL register table ``(*group_cols, reg INT, rho INT)``.

    ``item_col`` may be any deterministically string-castable type
    (string / integer); it is hashed with the portable ``hash60``. The
    aggregation is ``max`` — partially aggregable, so each map
    partition emits at most ``m = 2^p`` rows per group and the single
    exchange is cardinality-bounded no matter how many items flow in.
    Register tables from disjoint inputs merge with
    :func:`hll_merge` (register-wise max) — the sketch is a semigroup.
    """
    reg_bits = 60 - p
    h = hash60(F.col(item_col).cast("string"))
    reg = F.shiftright(h, reg_bits).cast("int")
    w = h.bitwiseAND(F.lit((1 << reg_bits) - 1))
    # rank of the first 1-bit in the low reg_bits bits (1-based); all-
    # zero suffix ranks reg_bits + 1. bin() renders minimal binary in
    # both engines, so bit_length(w) == length(bin(w)) for w > 0.
    rho = (
        F.when(w == 0, F.lit(reg_bits + 1))
        .otherwise(F.lit(reg_bits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    keys = [*group_cols, "reg"]
    return (
        df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*keys)
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge two register tables (register-wise max): sketch(A union B)."""
    keys = [*group_cols, "reg"]
    return a.unionByName(b).groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    regs: DataFrame,
    group_cols: Sequence[str] = (),
    p: int = HLL_P,
) -> DataFrame:
    """Distinct-count estimates from a register table:
    ``(*group_cols, zeros BIGINT, z_scaled BIGINT, est_micro BIGINT,
    est DOUBLE)``.

    Engine-exact protocol: the harmonic-mean denominator is summed as
    the exact BIGINT ``sum(2^(Rmax - rho))`` (each term a power of two,
    absent registers contribute ``2^Rmax`` via the ``zeros`` term), so
    it is independent of aggregation order; the one float step is a
    single int64->double division against a numerator emitted as a
    repr-exact double literal, snapped to micro ints. Raw estimate
    only — the small-range linear-counting correction needs ``ln``
    (not bit-exact across engines) and lives in the Python helper
    :func:`hll_corrected_estimate_py` for consumers that want it.
    """
    m = 1 << p
    r_max = (60 - p) + 1
    # sum of 2^(Rmax - rho) over PRESENT registers; zeros handled below.
    # shiftleft via expr: the python wrapper types numBits as a plain
    # int, but the SQL function takes a full expression.
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {r_max} - rho)")
    agg = regs.groupBy(*group_cols).agg(
        (F.lit(m) - F.count("*")).cast("long").alias("zeros"),
        F.sum(term).cast("long").alias("z_present"),
    )
    z = (F.col("z_present") + F.col("zeros") * F.lit(1 << r_max)).cast("long")
    numerator = _hll_alpha(m) * m * m * float(1 << r_max)
    est = F.lit(numerator) / z.cast("double")
    est_micro = F.floor(est * F.lit(1e6) + F.lit(0.5)).cast("long")
    return agg.select(
        *group_cols,
        F.col("zeros"),
        z.alias("z_scaled"),
        est_micro.alias("est_micro"),
        (est_micro / F.lit(1e6)).alias("est"),
    )


def hll_distinct(
    df: DataFrame,
    item_col: str,
    group_cols: Sequence[str] = (),
    p: int = HLL_P,
) -> DataFrame:
    """One-shot per-group approximate distinct count (registers +
    estimate)."""
    return hll_estimate(
        hll_registers(df, item_col, group_cols, p), group_cols, p
    )


def hll_sql(
    items_cte: str,
    item_expr: str,
    group_exprs: Sequence[str] = (),
    p: int = HLL_P,
) -> str:
    """DuckDB twin of :func:`hll_distinct`: a full query string over a
    CTE body ``items_cte`` (must define relation ``items``) producing
    the identical columns. Generated from the same constants as the
    Spark path so oracle and engine cannot drift."""
    m = 1 << p
    reg_bits = 60 - p
    r_max = reg_bits + 1
    numerator = repr(_hll_alpha(m) * m * m * float(1 << r_max))
    g_sel = "".join(f"{g}, " for g in group_exprs)
    g_by = ("GROUP BY " + ", ".join(group_exprs)) if group_exprs else ""
    h = hash60_sql(f"({item_expr})::VARCHAR")
    return f"""
        WITH {items_cte},
        hashed AS (
            SELECT {g_sel}{h} AS h FROM items),
        regs AS (
            SELECT {g_sel}(h >> {reg_bits})::INT AS reg,
                   max(CASE WHEN (h & {(1 << reg_bits) - 1}) = 0
                            THEN {r_max}
                            ELSE {r_max} - length(bin(h & {(1 << reg_bits) - 1}))
                       END)::INT AS rho
            FROM hashed GROUP BY {g_sel}reg),
        agg AS (
            SELECT {g_sel}({m} - count(*))::BIGINT AS zeros,
                   (sum((1::BIGINT << ({r_max} - rho)))
                    + ({m} - count(*)) * (1::BIGINT << {r_max}))::BIGINT
                       AS z_scaled
            FROM regs {g_by})
        SELECT {g_sel}zeros, z_scaled,
               floor({numerator} / z_scaled::DOUBLE * 1e6 + 0.5)::BIGINT
                   AS est_micro,
               floor({numerator} / z_scaled::DOUBLE * 1e6 + 0.5)::BIGINT
                   / 1e6 AS est
        FROM agg
    """


def hll_corrected_estimate_py(zeros: int, z_scaled: int, p: int = HLL_P) -> float:
    """Python-side estimate WITH the standard small-range correction
    (linear counting when est <= 2.5m and empty registers remain —
    uses ``ln``, hence not part of the cross-engine surface)."""
    import math

    m = 1 << p
    r_max = (60 - p) + 1
    est = _hll_alpha(m) * m * m * float(1 << r_max) / float(z_scaled)
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est


def hll_py(items, p: int = HLL_P) -> tuple[int, int, int]:
    """Python twin of the register/zeros/z_scaled pipeline (tests)."""
    from kg_microbe_merge_spark.functions.hashing import hash60_py

    m = 1 << p
    reg_bits = 60 - p
    r_max = reg_bits + 1
    regs: dict[int, int] = {}
    for it in items:
        h = hash60_py(str(it))
        reg = h >> reg_bits
        w = h & ((1 << reg_bits) - 1)
        rho = r_max if w == 0 else r_max - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    zeros = m - len(regs)
    z_scaled = sum(1 << (r_max - r) for r in regs.values()) + zeros * (
        1 << r_max
    )
    numerator = _hll_alpha(m) * m * m * float(1 << r_max)
    est_micro = int((numerator / float(z_scaled)) * 1e6 + 0.5)
    return zeros, z_scaled, est_micro


# --- Count-Min ------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_slot(item, row: int, width: int, family: str):
    """Row ``row``'s counter column for an item (Spark Column)."""
    return (universal_slot(hash60(item.cast("string")), row, family) % width).cast(
        "int"
    )


def _cms_slot_sql(item_expr: str, row: int, width: int, family: str) -> str:
    h = hash60_sql(f"({item_expr})::VARCHAR")
    return f"(({universal_slot_sql(h, row, family)}) % {width})::INT"


def cms_counters(
    df: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    family: str = "cms",
) -> DataFrame:
    """Count-Min counter table ``(row INT, col INT, cnt BIGINT)`` over
    the item stream (one count per input ROW — not distinct).

    One scan: the ``depth`` probes per item are a row-local array
    explode (no self-union re-reading the input), and the count is
    partially aggregated map-side, so each map partition contributes at
    most ``depth * width`` cells to the single exchange — counter
    state, not stream size, crosses the wire. Counter tables from
    disjoint inputs merge with :func:`cms_merge` (cell-wise sum)."""
    item = F.col(item_col)
    probes = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cms_slot(item, r, width, family).alias("col"),
            )
            for r in range(depth)
        ]
    )
    pr = df.select(F.explode(probes).alias("p"))
    return pr.groupBy(
        F.col("p.row").alias("row"), F.col("p.col").alias("col")
    ).agg(F.count("*").cast("long").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two counter tables (cell-wise sum): sketch(A ++ B)."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimates(
    counters: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    family: str = "cms",
) -> DataFrame:
    """Frequency estimates ``(item, est BIGINT)`` for each DISTINCT row
    of ``items``: the Count-Min upper bound ``min over rows of
    counter[row, slot_row(item)]`` (never under the true count).

    The counter table is at most ``depth * width`` cells — it is
    broadcast, so probing N query items is an N-row map-side join, no
    shuffle of the queries beyond their own distinct."""
    item = F.col(item_col)
    probes = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cms_slot(item, r, width, family).alias("col"),
            )
            for r in range(depth)
        ]
    )
    qprobes = F.array(
        *[
            F.struct(
                F.lit(r).alias("qrow"),
                _cms_slot(F.col("item"), r, width, family).alias("qcol"),
            )
            for r in range(depth)
        ]
    )
    q = (
        items.select(item.alias("item"))
        .distinct()
        .select("item", F.explode(qprobes).alias("p"))
        .select("item", F.col("p.qrow").alias("qrow"), F.col("p.qcol").alias("qcol"))
    )
    # left join: a cell never incremented is an implicit 0
    joined = q.join(
        F.broadcast(counters),
        (q["qrow"] == counters["row"]) & (q["qcol"] == counters["col"]),
        "left",
    ).select("item", F.coalesce("cnt", F.lit(0)).cast("long").alias("c"))
    return joined.groupBy("item").agg(F.min("c").cast("long").alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    item_col: str,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    family: str = "cms",
    candidate_mod: int = 1,
) -> DataFrame:
    """Items whose Count-Min estimate is >= ``threshold``:
    ``(item, est BIGINT)``. One-sided: contains every true heavy
    hitter; may contain collision-inflated extras (bounded by the
    sketch error).

    ``candidate_mod`` is the scale lever for the candidate set: with
    ``q > 1``, only items in a deterministic 1/q hash sample of the
    stream are probed — an item with true count >= threshold appears in
    the sample with probability ``1 - (1 - 1/q)^threshold`` (choose
    ``q <= threshold / 20`` for a ~1 - e^-20 guarantee), so candidate
    generation never materializes the full distinct-item set. The
    sample is by ``hash60(item)`` — deterministic, data-parallel, and
    reproducible in the oracle."""
    cand = df
    if candidate_mod > 1:
        keep = (
            hash60_seeded(F.col(item_col).cast("string"), F.lit("cms-cand"))
            % candidate_mod
            == 0
        )
        cand = df.filter(keep)
    counters = cms_counters(df, item_col, depth, width, family)
    est = cms_estimates(counters, cand, item_col, depth, width, family)
    return est.filter(F.col("est") >= threshold)


def cms_heavy_hitters_sql(
    items_cte: str,
    item_expr: str,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    family: str = "cms",
    candidate_mod: int = 1,
) -> str:
    """DuckDB twin of :func:`cms_heavy_hitters` over a CTE body
    ``items_cte`` (must define relation ``items`` with the item
    column)."""
    probes_union = " UNION ALL ".join(
        f"SELECT {r} AS row, {_cms_slot_sql(item_expr, r, width, family)} AS col"
        f" FROM items"
        for r in range(depth)
    )
    cand_where = ""
    if candidate_mod > 1:
        h = hash60_sql(f"(({item_expr})::VARCHAR || ':cms-cand')")
        cand_where = f"WHERE ({h}) % {candidate_mod} = 0"
    qprobes_union = " UNION ALL ".join(
        f"SELECT item, {r} AS row,"
        f" {_cms_slot_sql('item', r, width, family)} AS col FROM cand"
        for r in range(depth)
    )
    return f"""
        WITH {items_cte},
        probes AS ({probes_union}),
        counters AS (
            SELECT row, col, count(*)::BIGINT AS cnt
            FROM probes GROUP BY row, col),
        cand AS (SELECT DISTINCT {item_expr} AS item FROM items {cand_where}),
        qp AS ({qprobes_union})
        SELECT item, est FROM (
            SELECT qp.item, min(coalesce(k.cnt, 0))::BIGINT AS est
            FROM qp LEFT JOIN counters k
              ON qp.row = k.row AND qp.col = k.col
            GROUP BY qp.item)
        WHERE est >= {threshold}
    """


# --- log-binned quantile histogram ----------------------------------------
#
# The third mergeable sketch: approximate quantiles over non-negative
# integer measures (doc lengths, token counts, latencies) with bounded
# relative error 2^-s and bounded state. Exact quantiles need a global
# sort (a full range-shuffle of the corpus); the histogram needs ONE
# partial-aggregated count per (group, bin) — a few hundred bins per
# group regardless of row count — and merges by cell-wise sum.
#
# Bin mapping is the float-like packed exponent/mantissa over the
# integer bit length (HdrHistogram's scheme): values below 2^s are
# exact; above, the top s mantissa bits after the leading 1 are kept.
# Monotone, pure integer, identical in Spark SQL / DuckDB / Python —
# so quantile extraction (smallest bin whose cumulative count reaches
# ceil(q * n)) is engine-exact, and the sketch gets a full value
# oracle like the other two.

QUANT_S = 4  # mantissa bits: relative error <= 2^-4 = 6.25%


def _bin_expr_sql(x: str, s: int) -> str:
    """Engine-shared SQL text of the bin mapping (valid in BOTH Spark
    SQL and DuckDB: length(bin(x)), >>, &, CASE)."""
    bl = f"length(bin({x}))"
    return (
        f"(CASE WHEN ({x}) < {1 << s} THEN ({x}) "
        f"ELSE ((({bl}) - {s}) << {s}) "
        f"| ((({x}) >> (({bl}) - 1 - {s})) & {(1 << s) - 1}) END)"
    )


def _bin_lower_py(b: int, s: int) -> int:
    if b < (1 << s):
        return b
    e = (b >> s) - 1
    m = b & ((1 << s) - 1)
    return ((1 << s) + m) << e


def log_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    s: int = QUANT_S,
) -> DataFrame:
    """Per-group log-binned histogram ``(*group_cols, bin INT,
    cnt BIGINT)`` over a NON-NEGATIVE integer column (negative values
    raise downstream of the CHECK in the caller's hands; NULLs are
    dropped). Partially aggregated — each map partition emits at most
    the bin count per group; merge histograms with
    :func:`histogram_merge`."""
    b = F.expr(_bin_expr_sql(f"CAST(`{value_col}` AS BIGINT)", s)).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) >= 0))
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def histogram_merge(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge two histograms (cell-wise sum): sketch(A ++ B)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    group_cols: Sequence[str] = (),
    s: int = QUANT_S,
) -> DataFrame:
    """Quantile estimates from a histogram: ``(*group_cols, q DOUBLE,
    est BIGINT)`` — ``est`` is the lower bound of the smallest bin
    whose cumulative count reaches ``ceil(q * n)`` (true quantile is
    within relative error 2^-s above it). Integer ranks → engine-exact.

    The cumulative sum is a per-group window over the (tiny) histogram
    relation, not the data."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*[F.col(g) for g in group_cols])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*[F.col(g) for g in group_cols])
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    # bin lower bound, inverse of the bin mapping — integer exprs only
    lower = F.expr(
        f"CASE WHEN bin < {1 << s} THEN CAST(bin AS BIGINT) "
        f"ELSE CAST(({1 << s} | (bin & {(1 << s) - 1})) AS BIGINT) "
        f"<< ((bin >> {s}) - 1) END"
    )
    qcol = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    exp = cum.select(*group_cols, "bin", "cum", "total", qcol)
    hit = (
        exp.filter(
            F.col("cum")
            >= F.ceil(F.col("total") * F.col("q")).cast("long")
        )
        .groupBy(*group_cols, "q")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(*group_cols, "q", lower.alias("est"))


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    s: int = QUANT_S,
) -> DataFrame:
    """One-shot per-group approximate quantiles."""
    return histogram_quantiles(
        log_histogram(df, value_col, group_cols, s), qs, group_cols, s
    )


def quantile_sketch_sql(
    items_cte: str,
    value_expr: str,
    group_exprs: Sequence[str] = (),
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    s: int = QUANT_S,
) -> str:
    """DuckDB twin of :func:`quantile_sketch` over a CTE body
    ``items_cte`` (must define relation ``items``)."""
    g_sel = "".join(f"{g}, " for g in group_exprs)
    g_by = ", ".join(group_exprs) if group_exprs else ""
    part = f"PARTITION BY {g_by}" if group_exprs else ""
    grp = ("GROUP BY " + g_by) if group_exprs else ""
    b = _bin_expr_sql(f"CAST(({value_expr}) AS BIGINT)", s)
    # ::DOUBLE — DuckDB parses bare decimal literals as DECIMAL, Spark
    # emits DOUBLE; both must carry the identical IEEE double
    q_rows = " UNION ALL ".join(
        f"SELECT ({float(q)!r})::DOUBLE AS q" for q in qs
    )
    lower = (
        f"CASE WHEN bin < {1 << s} THEN bin::BIGINT "
        f"ELSE (({1 << s} | (bin & {(1 << s) - 1}))::BIGINT) "
        f"<< ((bin >> {s}) - 1) END"
    )
    return f"""
        WITH {items_cte},
        hist AS (
            SELECT {g_sel}{b}::INT AS bin, count(*)::BIGINT AS cnt
            FROM items
            WHERE ({value_expr}) IS NOT NULL AND ({value_expr}) >= 0
            GROUP BY {g_sel}bin),
        cum AS (
            SELECT {g_sel}bin,
                   sum(cnt) OVER ({part} ORDER BY bin
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
                   sum(cnt) OVER ({part})::BIGINT AS total
            FROM hist),
        qs AS ({q_rows}),
        hit AS (
            SELECT {g_sel}q, min(bin) AS bin
            FROM cum CROSS JOIN qs
            WHERE cum >= ceil(total * q)::BIGINT
            GROUP BY {g_sel}q)
        SELECT {g_sel}q, ({lower}) AS est FROM hit
    """


def quantile_sketch_py(values, qs=(0.5, 0.9, 0.99), s: int = QUANT_S):
    """Python twin: {q: est} over non-negative ints."""
    import math
    from collections import Counter

    def to_bin(x: int) -> int:
        if x < (1 << s):
            return x
        bl = x.bit_length()
        return ((bl - s) << s) | ((x >> (bl - 1 - s)) & ((1 << s) - 1))

    hist = Counter(to_bin(v) for v in values if v is not None and v >= 0)
    bins = sorted(hist)
    total = sum(hist.values())
    out = {}
    for q in qs:
        rank = math.ceil(total * q)
        cum = 0
        for b in bins:
            cum += hist[b]
            if cum >= rank:
                out[q] = _bin_lower_py(b, s)
                break
    return out


def cms_py(items, depth: int = CMS_DEPTH, width: int = CMS_WIDTH, family: str = "cms"):
    """Python twin: returns (counters dict[(row,col)] -> cnt,
    estimate fn)."""
    from kg_microbe_merge_spark.functions.hashing import (
        MERSENNE31,
        hash60_py,
        universal_params,
    )

    params = [universal_params(r, family) for r in range(depth)]

    def slots(item) -> list[int]:
        h = hash60_py(str(item)) & 0x7FFFFFFF
        return [((h * a + b) % MERSENNE31) % width for a, b in params]

    counters: dict[tuple[int, int], int] = {}
    for it in items:
        for r, c in enumerate(slots(it)):
            counters[(r, c)] = counters.get((r, c), 0) + 1

    def estimate(item) -> int:
        return min(
            counters.get((r, c), 0) for r, c in enumerate(slots(item))
        )

    return counters, estimate
