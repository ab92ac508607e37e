"""Unigram-LM (SentencePiece-style) tokenizer: seed vocabulary,
lattice segmentation as shortest path, and hard-EM training.

The third member of the tokenizer family: ``operators/vocab.py``
counts whole words, ``operators/bpe.py`` learns merges bottom-up;
the unigram LM (Kudo 2018) goes top-down — start from a large
substring seed vocabulary, segment every word into the MIN-COST piece
sequence under piece costs ``-ln p(piece)``, then re-estimate from
usage and shrink. Sampling-friendly tokenizers (XLNet/T5/SentencePiece
default) train exactly this way.

Segmentation IS a shortest-path problem — for a word of length n,
lattice nodes are the n+1 cut positions and every vocabulary piece
matching ``word[i:j]`` is an edge ``i → j`` with integer cost
``cost_micro(piece)``; the min-cost segmentation is the shortest 0→n
path. But the lattice never spans rows (a word is ≤ max_word_len
chars), so the RIGHT physical plan is not the distributed SSSP
operator (≈2·max_word_len driver-scheduled rounds for a per-row
problem — measured prohibitive) but the engine's row-local discipline:
one Arrow-batched ``mapInPandas`` DP over the word dimension with the
vocabulary costs shipped in the closure (the robots-parser /
quality-model precedent — the vocab is bounded by construction), zero
shuffles, one pass. The walk-enumeration DuckDB oracle checks the DP
against an independent formulation of the same lattice.

Training is HARD-EM (Viterbi-EM — the documented simplification of
SentencePiece's soft EM, which needs float forward-backward sums this
engine's exact-integer discipline deliberately avoids): per round,
segment with current costs, count piece usage weighted by word
frequency, keep the ``vocab_size`` most-used pieces (single
characters always kept — any word stays segmentable), recompute costs
``floor(-ln(count/total)·10^6 + 0.5)`` (the IC/bm25 micro-ln
protocol: ln over exact-integer-derived doubles, identical in Spark,
Python and DuckDB).

Determinism: path-cost TIES break toward the smaller predecessor
position (:func:`segment_py` is both the executed kernel and the
test twin, so the rule is definitionally shared). The driver gate
verifies the min COST per word against an independent
walk-enumeration oracle (unique regardless of ties); piece-level
reconstruction and the training loop are pytest-proven.

Scale: the state is the Zipf-bounded distinct-WORD dimension (the BPE
precedent — ~10^7 rows at 100 TB, independent of corpus size); the
only shuffles in training are the piece usage/seed count
aggregations, keyed on pieces and map-side combinable.

Reference scope: beyond the reference; no reference code consulted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _substring_candidates(
    words: DataFrame, max_piece_len: int
) -> DataFrame:
    """Row-local (word, freq, i, piece) for every substring start i,
    1 <= len(piece) <= max_piece_len — a transform over the position
    sequence behind a projection barrier, zero Python."""
    return (
        words.select(
            "word", "freq",
            F.explode(
                F.sequence(F.lit(0), F.length("word") - 1)
            ).alias("i"),
        )
        .select(
            "word", "freq", "i",
            # the length sequence is clipped to the remaining suffix so
            # substring() never truncates — a truncated piece would be
            # counted once per intended length, an overcount
            F.explode(
                F.expr(
                    f"transform(sequence(1, least({max_piece_len}, "
                    "length(word) - i)), "
                    "l -> substring(word, i + 1, l))"
                )
            ).alias("piece"),
        )
    )


def seed_vocab(
    words: DataFrame,
    max_piece_len: int = 6,
    vocab_size: int = 1000,
    min_count: int = 2,
) -> DataFrame:
    """Seed ``(piece, count)``: the ``vocab_size`` substrings with the
    highest frequency-weighted occurrence counts (count desc, piece
    asc tie-break; bounded TakeOrdered, no global sort), UNION all
    single characters (coverage guarantee — kept regardless of count
    or vocab_size). ``words`` is the (word, freq) dimension."""
    counts = (
        _substring_candidates(words, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("freq").alias("count"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(
            (F.length("piece") > 1) & (F.col("count") >= min_count)
        )
        .orderBy(F.col("count").desc(), F.col("piece"))
        .limit(vocab_size)
    )
    return chars.unionByName(multi)


def vocab_costs(vocab: DataFrame) -> DataFrame:
    """``(piece, count, cost_micro)`` with the micro-ln protocol:
    cost = floor(-ln(count/total)·10^6 + 0.5) over the exact BIGINT
    count and total."""
    total = vocab.agg(F.sum("count")).first()[0]
    return vocab.select(
        "piece",
        "count",
        F.expr(
            f"CAST(floor(-ln(CAST(count AS DOUBLE) / "
            f"CAST({total} AS DOUBLE)) * {MICRO} + 0.5) AS BIGINT)"
        ).alias("cost_micro"),
    )


def segment_words(
    words: DataFrame,
    costs: DataFrame,
    max_piece_len: int = 6,
    max_word_len: int = 24,
) -> DataFrame:
    """Min-cost segmentation of every word:
    ``(word, freq, cost_micro, pieces array<string>)``.

    One Arrow-batched DP pass over the (word, freq) dimension — the
    vocabulary ``(piece, cost_micro)`` is collected (vocab-bounded by
    construction) and shipped in the closure; ties break toward the
    smaller predecessor position (deterministic, mirrored by
    :func:`segment_py` and checked against the walk-enumeration
    oracle). Words longer than ``max_word_len`` or containing
    uncovered characters are dropped (single chars in the vocabulary
    make the latter impossible for in-corpus words)."""
    import pandas as pd

    cost_map = {
        r["piece"]: int(r["cost_micro"])
        for r in costs.select("piece", "cost_micro").collect()
    }

    def gen(batches):
        for pdf in batches:
            rows = []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                res = segment_py(
                    [(word, int(freq))], cost_map,
                    max_piece_len=max_piece_len,
                    max_word_len=max_word_len,
                )
                if word in res:
                    c, pieces = res[word]
                    rows.append((word, int(freq), c, pieces))
            yield pd.DataFrame(
                rows, columns=["word", "freq", "cost_micro", "pieces"]
            )

    return words.mapInPandas(
        gen,
        "word string, freq long, cost_micro long, "
        "pieces array<string>",
    )


def unigram_train(
    words: DataFrame,
    rounds: int = 2,
    vocab_size: int = 1000,
    max_piece_len: int = 6,
    max_word_len: int = 24,
    min_count: int = 2,
) -> DataFrame:
    """Hard-EM unigram training: seed → (segment → usage-count →
    shrink → re-cost) × rounds. Returns the final
    ``(piece, count, cost_micro)`` vocabulary, where ``count`` is the
    frequency-weighted usage in the last segmentation (single chars
    unused in any segmentation keep count 0 with infinite-cost
    stand-in ``cost_micro`` of the smallest observed probability —
    they remain only as coverage fallbacks)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    vocab = seed_vocab(
        words, max_piece_len=max_piece_len,
        vocab_size=vocab_size, min_count=min_count,
    )
    costs = vocab_costs(vocab).localCheckpoint(eager=True)
    for _ in range(rounds):
        seg = segment_words(
            words, costs,
            max_piece_len=max_piece_len, max_word_len=max_word_len,
        )
        usage = (
            seg.select(
                "freq", F.explode("pieces").alias("piece")
            )
            .groupBy("piece")
            .agg(F.sum("freq").alias("count"))
        )
        chars = (
            costs.filter(F.length("piece") == 1)
            .select("piece")
            .join(usage, "piece", "left")
            .select("piece", F.coalesce("count", F.lit(0)).alias("count"))
        )
        multi = (
            usage.filter(F.length("piece") > 1)
            .orderBy(F.col("count").desc(), F.col("piece"))
            .limit(vocab_size)
        )
        vocab = chars.unionByName(multi)
        # zero-count coverage chars: cost of count 1 (rarest possible)
        costed = vocab_costs(
            vocab.select(
                "piece",
                F.greatest("count", F.lit(1)).alias("count"),
            )
        ).select("piece", "cost_micro")
        costs = (
            vocab.join(costed, "piece")
            .select("piece", "count", "cost_micro")
            .localCheckpoint(eager=True)
        )
    return costs


def segment_cost_sql(
    words_sql: str,
    costs_sql: str,
    max_piece_len: int = 6,
    max_word_len: int = 24,
) -> str:
    """DuckDB twin of the segmentation COST (independent formulation:
    enumerate every complete piece walk per word recursively and take
    the min total cost — unique regardless of path ties, so it checks
    the SSSP lattice formulation end to end). ``words_sql`` yields
    (word, freq); ``costs_sql`` yields (piece, cost_micro)."""
    return f"""
        WITH RECURSIVE
        w AS MATERIALIZED (
            SELECT word, freq FROM ({words_sql})
            WHERE length(word) <= {max_word_len}),
        vc AS MATERIALIZED (SELECT piece, cost_micro FROM ({costs_sql})),
        walk(word, pos, cost) AS (
            SELECT word, 0, 0::BIGINT FROM w
            UNION
            SELECT wk.word, wk.pos + length(vc.piece),
                   wk.cost + vc.cost_micro
            FROM walk wk
            JOIN w ON w.word = wk.word
            JOIN vc ON length(vc.piece) <= {max_piece_len}
                   AND vc.piece = substring(
                           wk.word, wk.pos + 1, length(vc.piece))
        )
        SELECT wk.word, min(wk.cost)::BIGINT AS cost_micro
        FROM walk wk JOIN w ON w.word = wk.word
        WHERE wk.pos = length(wk.word)
        GROUP BY wk.word
    """


def segment_py(
    word_freqs: list[tuple],
    costs: dict,
    max_piece_len: int = 6,
    max_word_len: int = 24,
):
    """Python twin: per-word DP with the identical min-predecessor
    tie-break (smaller predecessor POSITION wins, matching the
    zero-padded node-id min). Returns
    {word: (cost_micro, [pieces])}."""
    out = {}
    for word, _freq in word_freqs:
        if len(word) > max_word_len:
            continue
        n = len(word)
        INF = float("inf")
        dist = [INF] * (n + 1)
        pred = [None] * (n + 1)
        dist[0] = 0
        for j in range(1, n + 1):
            best, bp = INF, None
            for pl in range(1, min(max_piece_len, j) + 1):
                i = j - pl
                piece = word[i:j]
                if piece in costs and dist[i] != INF:
                    c = dist[i] + costs[piece]
                    if c < best or (c == best and (bp is None or i < bp)):
                        best, bp = c, i
            dist[j], pred[j] = best, bp
        if dist[n] == INF:
            continue
        cuts = [n]
        while cuts[-1] != 0:
            cuts.append(pred[cuts[-1]])
        cuts.reverse()
        pieces = [word[cuts[k]:cuts[k + 1]] for k in range(len(cuts) - 1)]
        out[word] = (int(dist[n]), pieces)
    return out
