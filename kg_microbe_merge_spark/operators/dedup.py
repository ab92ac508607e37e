"""Document deduplication family for training-data pipelines.

All variants are declarative DataFrame plans built from JVM-side
functions — no Python in the hot path (the shingle/hash math uses
md5-derived portable hashes / higher-order array functions, all
codegen'd or array-local).

Operators:
- :func:`dedup_exact` — hash-groupBy on normalized content.
- :func:`shingle_array` / :func:`shingle_postings` — n-gram shingling,
  the shared producer for Jaccard/MinHash/SimHash.
- :func:`ngram_jaccard_pairs` — exact Jaccard over candidate pairs via
  shingle-inverted-index join.
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash +
  banded LSH: shingle → K hash slots → band → bucket join.
- :func:`simhash_signatures` / :func:`simhash_near_dups` — 64-bit
  SimHash with Hamming verification via banded bucketing.
- :func:`embedding_near_dups` — cosine near-duplicates over an
  ``array<float>`` column (see operators/similarity.py for top-k ANN).

Hashing is the md5-derived 60-bit portable hash (functions/hashing.py)
by default so the ENTIRE MinHash/SimHash pipeline has a bit-exact DuckDB
oracle twin; pass ``hash_fn=F.xxhash64`` for the (slightly faster,
non-mirrorable) variant.

Scale notes
-----------
* Shingle production is row-local and exchange-free: the token array is
  materialized once per row behind a projection barrier (the array is
  referenced more than once downstream, so CollapseProject cannot inline
  the normalize+split chain into the n-gram lambda — verified via
  ``.explain``; see tests/test_dedup.py::test_shingle_plan_no_exchange).
  The only shuffles in MinHash/SimHash are the signature groupBy (which
  carries K longs per doc thanks to map-side partial aggregation) and
  the banded candidate join.
* Every candidate-generation step is join-on-bucket: cost is bounded by
  bucket sizes, never all-pairs. Hub buckets (boilerplate shingles) are
  the skew risk — ``ngram_jaccard_pairs`` drops shingles above a
  document-frequency ceiling before the self-join (standard web-dedup
  practice) and AQE skew-join splits what remains.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60, universal_slot
from ..functions.text import normalized_text


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per exact normalized content.

    One hash aggregation; the fingerprint is computed map-side so the
    shuffle key is a 32-char digest, not the document text.
    """
    fp = F.md5(normalized_text(F.col(text_col)))
    return (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(
            F.min(F.col(id_col)).alias(id_col),
            F.count("*").alias("dup_count"),
        )
        .drop("_fp")
    )


def shingle_array(
    df: DataFrame,
    n: int,
    text_col: str,
    id_col: str,
    hash_fn: Callable[[Column], Column] = hash60,
) -> DataFrame:
    """(doc_id, shingles: array<long>) — distinct word-n-gram hashes per
    document, computed entirely row-locally (ZERO exchange).

    The token array is materialized in its own projection and referenced
    more than once by the consumer (size + the n-gram lambda), which
    stops Catalyst's CollapseProject from inlining the normalize+split
    chain into every lambda element — so tokenization runs ONCE per row
    and each n-gram is a cheap slice+concat+hash over the ready array.
    Documents shorter than ``n`` tokens contribute one whole-document
    shingle.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("_toks"),
    )
    t = F.col("_toks")
    k = F.greatest(F.size(t) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: hash_fn(F.concat_ws(" ", F.slice(t, i + 1, n))),
    )
    whole = F.array(hash_fn(F.concat_ws(" ", t)))
    arr = F.when(F.size(t) >= n, grams).otherwise(whole)
    return toks.select("doc_id", F.array_distinct(arr).alias("shingles"))


def shingle_postings(
    df: DataFrame,
    n: int,
    text_col: str,
    id_col: str,
    hash_fn: Callable[[Column], Column] = hash60,
) -> DataFrame:
    """Distinct (doc_id, shingle-hash) postings — ``shingle_array``
    exploded. No exchange: the explode feeds downstream partial
    aggregations / joins in the same stage.

    ``explode_outer`` (not ``explode``) on purpose: the arrays are never
    empty (min 1 whole-doc shingle) so the row sets are identical, but
    plain explode triggers InferFiltersFromGenerate, which injects a
    ``size(shingles) > 0`` pre-filter that INLINES the whole
    tokenize+shingle expression a second time per row — doubling the
    scan-side CPU. Verified in tests/test_dedup.py::test_shingle_plan_no_exchange.
    """
    return shingle_array(df, n, text_col, id_col, hash_fn).select(
        "doc_id", F.explode_outer("shingles").alias("shingle")
    )


def _shingle_index(
    df: DataFrame, text_col: str, id_col: str, n: int, max_doc_freq: int | None
) -> DataFrame:
    """Inverted index (shingle, doc_id, set_size).

    With ``max_doc_freq``, shingles appearing in more than that many
    documents (stop-shingles: boilerplate) are removed from the universe
    BEFORE set sizes are computed, so downstream Jaccard is exact over
    the filtered universe — the standard web-dedup candidate-pruning
    practice; sum(df²) join cost is bounded by ceiling², never by the
    hottest boilerplate shingle.
    """
    sh = shingle_postings(df, n, text_col, id_col)
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    w = Window.partitionBy("doc_id")
    return sh.withColumn("set_size", F.count("*").over(w))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    Candidate pairs come from the shingle inverted index (docs sharing ≥1
    shingle); intersection size is a count per pair; union =
    |A| + |B| − |A∩B|. Output: (doc_a, doc_b, jaccard), doc_a < doc_b.
    """
    sh = _shingle_index(df, text_col, id_col, n, max_doc_freq)
    a = sh.select(
        F.col("shingle"),
        F.col("doc_id").alias("doc_a"),
        F.col("set_size").alias("size_a"),
    )
    b = sh.select(
        F.col("shingle"),
        F.col("doc_id").alias("doc_b"),
        F.col("set_size").alias("size_b"),
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: Callable[[Column], Column] = hash60,
) -> DataFrame:
    """K-slot MinHash signature per document.

    Slot k is the universal-hash family ``(a_k·s + b_k) mod 2^31−1``
    over the (md5-derived) shingle hash — 64 exact integer mul/mod per
    shingle instead of 64 md5 calls (measured 8× cheaper at sf0.1), and
    bit-exact reproducible in DuckDB (same literal a/b constants). One
    groupBy with K partially-aggregable ``min`` columns: the shuffle
    carries K longs per doc, never the shingle stream.
    """
    sh = shingle_postings(df, n, text_col, id_col, hash_fn)
    mins = [
        F.min(universal_slot(F.col("shingle"), k)).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{k}") for k in range(num_hashes)]).alias("sig")
    )


def band_struct_array(
    num_hashes: int, bands: int, sig_col: str = "sig"
) -> Column:
    """``array<struct<band:int, bucket:long>>`` LSH banding of a MinHash
    signature column — band ``i`` buckets on the :func:`hash60` of its
    ``r = num_hashes/bands`` comma-joined slots. Shared between the
    batch pair generator (:func:`minhash_lsh_pairs`) and the
    incremental index fold (``streaming/dedup_index.py``) so both sides
    of an index probe band identically."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(bnd).alias("band"),
                hash60(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(sig_col, bnd * r + j + 1)
                            for j in range(r)
                        ],
                    )
                ).alias("bucket"),
            )
            for bnd in range(bands)
        ]
    )


def sig_est_jaccard(sig_a: Column, sig_b: Column, num_hashes: int) -> Column:
    """Signature-estimated Jaccard: fraction of matching MinHash slots,
    rounded to the 6-decimal gate convention."""
    return F.round(
        F.size(
            F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda m: m)
        )
        / F.lit(float(num_hashes)),
        6,
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs.

    Bands of r = num_hashes/bands rows are hashed to buckets; docs
    sharing any band bucket are candidates; candidates are verified with
    the signature-estimated Jaccard (fraction of matching slots) ≥
    threshold. Output: (doc_a, doc_b, est_jaccard).
    """
    assert num_hashes % bands == 0
    sig = minhash_signatures(df, num_hashes, n, text_col, id_col)
    banded = sig.select(
        "doc_id",
        "sig",
        F.explode(band_struct_array(num_hashes, bands)).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(
        "band", "bucket", F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")
    )
    b = banded.select(
        "band", "bucket", F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")
    )
    # estimate + threshold-filter BEFORE the candidate dedup: the
    # estimate is deterministic per pair, so distinct on (ids, score)
    # equals distinct on ids — and the dedup exchange carries 2 ids + 1
    # double instead of two 64-long signatures per candidate (map-side
    # duplicate estimates, bounded by `bands`, are cheaper than
    # shuffling 1 KiB/candidate at 100 TB)
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "est_jaccard",
            sig_est_jaccard(F.col("sig_a"), F.col("sig_b"), num_hashes),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
        .distinct()
    )


def simhash_signatures(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: Callable[[Column], Column] = hash60,
) -> DataFrame:
    """(doc_id, sh) 64-bit SimHash via shingle postings + one groupBy
    with 64 ``sum(±1)`` columns — the aggregation is partial map-side,
    so the shuffle carries 64 longs per doc, never the shingle stream.

    With the default 60-bit portable hash, bits 60-63 of every shingle
    are 0, so those signature bits are constantly 0 on all documents —
    Hamming distances are unaffected (both sides zero) and the banding
    pigeonhole still holds; the DuckDB oracle mirrors the pipeline
    bit-for-bit."""
    exploded = shingle_postings(df, n, text_col, id_col, hash_fn).withColumnRenamed(
        "shingle", "h"
    )
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = exploded.groupBy("doc_id").agg(*sums)
    sig = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, b))
    return agg.select("doc_id", sig.alias("sh"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int | None = None,
    sig_bits: int = 60,
) -> DataFrame:
    """SimHash near-duplicate pairs with Hamming distance ≤ max_hamming.

    Candidate generation: split the low ``sig_bits`` of the hash into
    ``bands`` blocks (default ``max_hamming + 1`` — the pigeonhole
    guarantee: any pair within distance ≤ max_hamming has at least one
    block with zero differing bits) → equi-join per block, then verify
    exact Hamming via bit_count(xor). Output: (doc_a, doc_b, hamming).
    Passing a smaller ``bands`` trades guaranteed recall for fewer/
    larger candidate buckets.

    ``sig_bits`` defaults to 60 because the default shingle hash
    (``hash60``) leaves signature bits 60-63 constant-zero on every
    document: banding them would waste up to 4 bits of a block's
    keyspace (near-quadratic candidate blowup at scale), while the
    pigeonhole still holds over the low 60 — constant bits never differ,
    so every differing bit lives inside the banded range. Pass 64 with a
    full-width ``hash_fn``.
    """
    bands = bands if bands is not None else min(max_hamming + 1, sig_bits)
    base_w, rem = divmod(sig_bits, bands)
    widths = [base_w + (1 if i < rem else 0) for i in range(bands)]
    offsets = [sum(widths[:i]) for i in range(bands)]
    h = simhash_signatures(df, n=n, text_col=text_col, id_col=id_col)
    blocks = h.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        F.shiftrightunsigned("sh", offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sh", F.col("bk.block").alias("block"), F.col("bk.key").alias("key"))
    a = blocks.select("block", "key", F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = blocks.select("block", "key", F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    # verify + filter BEFORE the candidate dedup (same pattern as
    # minhash_lsh_pairs: the dedup exchange carries ids + one int, and
    # the Hamming filter shrinks it further)
    return (
        a.join(b, ["block", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column.

    Brute-force all-pairs — explicitly the CORRECTNESS BASELINE, O(N²);
    see operators/similarity.py ``lsh_cosine_topk`` for the scale path.
    ``max_rows`` guards against accidentally launching the quadratic
    plan on a large table (pass ``None`` to bypass, e.g. when an
    upstream filter already bounds the input).
    Output: (id_a, id_b, cosine), id_a < id_b, rounded to 6 decimals.
    """
    from .guards import require_small
    from .similarity import dot_expr, normalized_vectors, spread_stream_side

    if max_rows is not None:
        require_small(df, max_rows, op="embedding_near_dups",
                      alternative="operators.similarity.lsh_cosine_topk")
    # The stream side inherits the source partitioning; a single-file
    # parquet table would put the ENTIRE O(N²) pair scan on one core.
    # Spread the stream side across the cluster before the nested-loop
    # join (the build side is broadcast anyway).
    a = spread_stream_side(normalized_vectors(df, id_col, vec_col, "id_a", "va"))
    b = normalized_vectors(df, id_col, vec_col, "id_b", "vb")
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = dot_expr(F.col("va"), F.col("vb"))
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def near_dup_clusters(
    df: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level near-duplicate RESOLUTION: the MinHash+LSH pair
    graph collapsed into clusters via distributed connected components
    (large-star/small-star — same machinery as entity canonicalization),
    with the minimum id as each cluster's canonical survivor.

    Output: ``(id_col, canonical_id, kept)`` for every document that has
    at least one near-duplicate (singletons are absent — they are
    trivially kept). This is the step that turns pairwise similarity
    into an actual dedup decision: transitive chains (A~B~C with A≁C)
    land in ONE cluster with one survivor, instead of the
    pick-per-pair inconsistencies of greedy pairwise dropping.

    Scale: the pair graph is tiny relative to the corpus (only
    near-dups appear), CC converges in O(log² n) rounds over it; the
    corpus itself is never shuffled here.
    """
    from .components import connected_components

    pairs = minhash_lsh_pairs(
        df, threshold, num_hashes, bands, n, text_col, id_col
    )
    # Materialize the pair graph ONCE (lazy checkpoint: first CC action
    # triggers it): connected_components consumes its edge input from
    # two lineages (the node universe + the iterated edge set), which
    # would otherwise re-run the whole MinHash pipeline a second time.
    # On a real cluster use reliable checkpoint / an intermediate table.
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=False)
    m = connected_components(edges)
    return m.select(
        F.col("node").alias(id_col),
        F.col("component").alias("canonical_id"),
        (F.col("node") == F.col("component")).alias("kept"),
    )


def drop_near_duplicates(
    df: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus with near-duplicate losers removed: one survivor (the
    minimum id) per cluster, everything else anti-joined away. The loser
    list is the small side — Catalyst broadcasts it under the default
    autoBroadcast threshold."""
    losers = near_dup_clusters(
        df, threshold, num_hashes, bands, n, text_col, id_col
    ).filter(~F.col("kept")).select(id_col)
    return df.join(losers, id_col, "left_anti")


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/test contamination check: per training document, how many of
    its distinct word-``n``-gram shingles appear ANYWHERE in the
    held-out ``benchmark`` set.

    Returns ``(doc_id, n_shingles, n_contaminated)`` — consumers derive
    the contamination fraction and apply their own removal threshold
    (both counts are exact integers, so the result is float-free and
    engine-portable).

    100 TB design: the benchmark side is the tiny one (eval suites are
    MBs against a TB-scale corpus), so its distinct shingle set is
    BROADCAST — the corpus side is touched by exactly ONE exchange (the
    per-doc count aggregation, with map-side partial counts); shingle
    production itself is row-local (``shingle_postings``, zero
    exchange). Both counts come from the same single pass: a broadcast
    left join marks each posting as hit/miss, and one aggregation
    counts postings and hits together.
    """
    doc_sh = shingle_postings(docs, n, text_col, id_col)
    bench_sh = (
        shingle_postings(benchmark, n, text_col, id_col)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    marked = doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("_hit").alias("n_contaminated"),
    )


def duplicated_span_stats(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """Corpus-wide duplicated-SPAN detection (the substring-dedup signal
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): per document, what share of its distinct word-``n``-gram
    spans occurs in ≥ ``min_df`` DISTINCT documents anywhere in the
    corpus.

    This is different from pairwise similarity (Jaccard/MinHash): a page
    can be near-duplicate of nothing yet be 80% wire-copy boilerplate
    shared across thousands of pages — exactly what span-level dedup
    catches and document-level dedup misses. Consumers either drop
    documents above a ``dup_fraction`` threshold or (in a full substring
    dedup) cut the flagged spans out of the text.

    Returns ``(doc_id, n_spans, n_dup_spans, dup_fraction)`` with
    ``dup_fraction`` rounded to 6 decimals (one exact-int division —
    engine-portable).

    100 TB design: span production is row-local (``shingle_postings``,
    zero exchange — distinct hashes per doc) and runs ONCE: the
    document frequency is a ``count(*) over (partition by shingle)``
    window on the posting stream (postings are distinct per doc, so the
    count IS the distinct-doc count), which reuses the same shuffled
    postings for the df and the mark — a groupBy+self-join formulation
    would re-produce every shingle from text a second time. TWO
    exchanges total, both keyed on the 60-bit span hash / doc id, never
    on text: (1) the window partitioning, (2) the per-doc roll-up
    (map-side partial counts). Hot boilerplate spans are bounded by the
    window's per-key count state; AQE splits residual skew.
    """
    postings = shingle_postings(df, n, text_col, id_col)
    # postings are distinct (doc, span) pairs -> count(*) = distinct docs
    marked = postings.withColumn(
        "_df", F.count("*").over(Window.partitionBy("shingle"))
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                F.when(F.col("_df") >= min_df, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("n_dup_spans"),
        )
        .withColumn(
            "dup_fraction",
            F.round(
                F.col("n_dup_spans").cast("double")
                / F.col("n_spans").cast("double"),
                6,
            ),
        )
    )


def positional_span_postings(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ALL word-``n``-gram window starts per document:
    ``(doc_id, pos INT, span BIGINT)`` with ``pos`` the 0-based token
    index of the window start (documents shorter than ``n`` tokens
    contribute one whole-document span at pos 0). Unlike
    :func:`shingle_postings` this keeps positions and within-doc
    repeats — the relation substring CUTTING needs. Production is
    row-local (the ``shingle_array`` staged-projection barrier), zero
    exchange."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("_toks"),
    )
    t = F.col("_toks")
    k = F.greatest(F.size(t) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: hash60(F.concat_ws(" ", F.slice(t, i + 1, n))),
    )
    whole = F.array(hash60(F.concat_ws(" ", t)))
    arr = F.when(F.size(t) >= n, grams).otherwise(whole)
    s2 = toks.select("doc_id", arr.alias("_g"))
    return s2.select(
        "doc_id", F.posexplode_outer("_g").alias("pos", "span")
    )


def remove_duplicated_spans(
    df: DataFrame,
    n: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring deduplication CUT (the removal half of Lee et al.'s
    "Deduplicating Training Data Makes Language Models Better" —
    :func:`duplicated_span_stats` is the detection half): delete every
    token covered by a word-``n``-gram span that occurs in ≥ ``min_df``
    DISTINCT documents, and return the rebuilt text.

    Returns ``(doc_id, clean_text STRING, n_tokens BIGINT,
    n_removed BIGINT)`` — ``clean_text`` is over NORMALIZED tokens
    (lowercased, whitespace-collapsed; the same normalization every
    dedup operator here uses), with flagged windows removed and the
    survivors re-joined by single spaces. A document that is entirely
    boilerplate comes back with ``clean_text = ''`` — consumers drop
    or keep by ``n_removed / n_tokens``. Re-joining survivors can form
    NEW n-grams across a cut boundary, so one pass removes the input's
    duplicated spans but is not a fixpoint (measured at sf0.01:
    2101 duplicated spans → 23 boundary-formed ones); iterate for a
    fixpoint if the consumer needs it.

    100 TB shape: span production is row-local; document frequency is
    a partial-aggregated count over DISTINCT (doc, span) pairs; the
    flagged-span set (boilerplate is a small fraction of distinct
    spans) semi-join-prunes the positional postings — AQE broadcasts
    it when small; flagged positions aggregate to ONE int array per
    affected document, and the rebuild joins that array back to the
    documents table and re-tokenizes row-locally — token arrays never
    shuffle, only (doc_id, positions). Coverage testing is a nested
    higher-order expression (filter-with-index × exists), zero Python.
    """
    pos = positional_span_postings(df, n, text_col, id_col)
    # doc frequency over DISTINCT (doc, span): within-doc repeats must
    # not fake cross-document duplication
    span_df = (
        pos.select("doc_id", "span")
        .distinct()
        .groupBy("span")
        .agg(F.count("*").alias("_df"))
    )
    flagged_spans = span_df.filter(F.col("_df") >= min_df).select("span")
    flagged = (
        pos.join(flagged_spans, "span", "left_semi")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("_flagged"))
    )
    joined = df.join(
        flagged, df[id_col] == flagged["doc_id"], "left"
    ).select(
        df[id_col].alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.coalesce(
            F.col("_flagged"), F.expr("CAST(array() AS ARRAY<INT>)")
        ).alias("_fl"),
    )
    # STAGED projections (the shingle_array barrier pattern): the token
    # array and the kept array each materialize in their own Project
    # and are referenced as attributes downstream — inlining them would
    # re-run split + the nested coverage HOF once per referencing
    # expression per row
    s1 = joined.select(
        "doc_id",
        F.split(normalized_text(F.col("_text")), " ").alias("_t"),
        "_fl",
    )
    t = F.col("_t")
    p = F.col("_fl")
    kept = F.filter(
        t,
        lambda tok, i: ~F.exists(
            p, lambda q: (q <= i) & (i < q + F.lit(n))
        ),
    )
    s2 = s1.select("doc_id", "_t", kept.alias("_kept"))
    return s2.select(
        "doc_id",
        F.array_join(F.col("_kept"), " ").alias("clean_text"),
        F.size(F.col("_t")).cast("long").alias("n_tokens"),
        (F.size(F.col("_t")) - F.size(F.col("_kept")))
        .cast("long")
        .alias("n_removed"),
    )


def remove_duplicated_spans_to_fixpoint(
    df: DataFrame,
    n: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iters: int = 5,
) -> DataFrame:
    """Iterate :func:`remove_duplicated_spans` until NO span occurs in
    ≥ ``min_df`` distinct documents (or ``max_iters``): cutting can
    form new n-grams where survivors re-join across a cut, and when two
    documents shrink onto the same residue they become duplicates of
    each other — the fixpoint clears both effects.

    Returns ``(doc_id, clean_text, n_tokens BIGINT, n_removed BIGINT)``
    with ``n_tokens`` the ORIGINAL token count and ``n_removed`` the
    total across rounds (derived as original − surviving, no per-round
    accumulation state).

    Iterative-operator shape (the CC / k-core pattern): each round is
    one full operator pass over the current (already-shrunk) text with
    an eager ``localCheckpoint`` truncating lineage, plus one cheap
    driver-side ``sum(n_removed)`` convergence check; rounds after the
    first run on strictly smaller input. Convergence is typically 2-3
    rounds — removed token mass shrinks geometrically (on a real
    cluster swap ``localCheckpoint`` for reliable ``checkpoint``, as
    with connected components)."""
    cur = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    n_tokens_first = None
    for _ in range(max_iters):
        out = remove_duplicated_spans(
            cur, n, min_df, "text", "doc_id"
        ).localCheckpoint(eager=True)
        if n_tokens_first is None:
            n_tokens_first = out.select("doc_id", "n_tokens")
        removed = out.agg(F.sum("n_removed")).first()[0] or 0
        cur = out.select("doc_id", F.col("clean_text").alias("text"))
        if removed == 0:
            break
    kept = F.when(F.col("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("text"), " "))
    )
    final = cur.select(
        "doc_id",
        F.col("text").alias("clean_text"),
        kept.cast("long").alias("_kept"),
    )
    return final.join(n_tokens_first, "doc_id").select(
        "doc_id",
        "clean_text",
        F.col("n_tokens"),
        (F.col("n_tokens") - F.col("_kept")).cast("long").alias("n_removed"),
    )


def remove_boilerplate_lines(
    df: DataFrame,
    min_df: int = 2,
    min_line_chars: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Line-level boilerplate removal (the CCNet / RefinedWeb curation
    stage): delete every LINE whose trimmed text occurs in ≥ ``min_df``
    DISTINCT documents — navigation bars, cookie banners, footers — and
    return the rebuilt text. The line-granular sibling of
    :func:`remove_duplicated_spans` (token-window granularity): web
    boilerplate repeats as whole rendered lines, so line keys catch it
    without the alignment sensitivity of fixed token windows.

    Lines are ``\\n`` splits; a line participates in frequency analysis
    only when its trimmed form has ≥ ``min_line_chars`` characters
    (short/empty lines are document structure — never counted, never
    removed). Kept lines are emitted VERBATIM (original whitespace),
    re-joined by ``\\n``.

    Returns ``(doc_id, clean_text STRING, n_lines BIGINT,
    n_removed BIGINT)``.

    100 TB shape: line production is row-local (split + posexplode);
    the shuffle key is the 60-bit line hash (never line text) — document
    frequency partial-aggregates over DISTINCT (hash, doc) pairs; the
    flagged-hash set (boilerplate is a tiny fraction of distinct lines)
    semi-join-prunes the positional postings and AQE broadcasts it when
    small; flagged positions collapse to ONE int array per affected
    document and the rebuild is a row-local indexed-filter HOF over the
    re-split original text — line arrays never shuffle, only (doc_id,
    positions). Hash semantics (md5-derived, :mod:`..functions.hashing`)
    are part of the spec so the DuckDB oracle verifies value-for-value.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "_line"),
    )
    elig = lines.filter(
        F.length(F.trim(F.col("_line"))) >= min_line_chars
    ).select("doc_id", "pos", hash60(F.trim(F.col("_line"))).alias("_h"))
    freq = (
        elig.select("_h", "doc_id")
        .distinct()
        .groupBy("_h")
        .agg(F.count("*").alias("_df"))
    )
    flagged_h = freq.filter(F.col("_df") >= min_df).select("_h")
    flagged = (
        elig.join(flagged_h, "_h", "left_semi")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("_fl"))
    )
    joined = df.join(
        flagged, df[id_col] == flagged["doc_id"], "left"
    ).select(
        df[id_col].alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.coalesce(
            F.col("_fl"), F.expr("CAST(array() AS ARRAY<INT>)")
        ).alias("_fl"),
    )
    # staged projection (the remove_duplicated_spans barrier pattern):
    # materialize the line array once, then filter it by index
    s1 = joined.select(
        "doc_id", F.split(F.col("_text"), "\n").alias("_l"), "_fl"
    )
    p = F.col("_fl")
    kept = F.filter(
        F.col("_l"), lambda ln, i: ~F.exists(p, lambda q: q == i)
    )
    s2 = s1.select("doc_id", "_l", "_fl", kept.alias("_kept"))
    return s2.select(
        "doc_id",
        F.array_join(F.col("_kept"), "\n").alias("clean_text"),
        F.size("_l").cast("long").alias("n_lines"),
        F.size("_fl").cast("long").alias("n_removed"),
    )
