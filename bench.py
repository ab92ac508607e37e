"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "triples_per_sec": N, ...}

Execution is forced with the noop sink (full computation, no driver
collect). The web-KG throughput number (triples/sec for the
corpus→extract→triples path — the north-star metric) is measured on a
freshly generated in-memory corpus so it exercises the pandas-UDF
stages, not parquet IO.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from kg_microbe_merge_spark.functions.triples import triples_from_corpus
from kg_microbe_merge_spark.session import get_spark
from kg_microbe_merge_spark.sources.corpus import generate_corpus

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS_PIPELINE = int(os.environ.get("BENCH_PIPELINE_DOCS", "20000"))

HEADLINE = [
    "q1_pricing_summary",
    "a3_nodes_group_merge",
    "a3_nodes_group_merge_skew_aware",
    "a4_edges_distinct",
    "a4_edges_provenance",
    "w1_priority_dedup",
    "j2_coverage_anti",
    "join_star_agg",
    "semi_join",
    "topk_per_group",
    "events_hourly",
    "sessionization",
    "rolling_stats",
    "corpus_curation",
    "rolling_1h_range",
    "lag_delta",
    "set_ops",
    "multimodal_features",
    "asof_enrich",
    "rollup_agg",
    "array_funcs",
    "pivot_events",
    "unpivot_stats",
    "date_arith",
    "range_band_join",
    "q3_shipping_priority",
    "q18_large_orders",
    "cc_components",
    "pagerank_kg",
    "kmeans_clusters",
    "bgp_two_hop",
    "graph_stats_report",
    "triples_extract",
    "dedup_exact",
    "text_quality",
    "repetition_ratio",
    "holdout_split",
    "deterministic_sample",
    "stratified_sample",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash_near_dups",
    "embedding_topk",
    "embedding_near_dups",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "bgp_filter_optional",
    "cypher_match",
    "near_dup_dedup",
    "benchmark_contamination",
    "sequence_packing",
    "kg_incremental_upsert",
    "bfs_khop",
    "triangle_counts",
    "quality_model_score",
    "duplicated_spans",
    "kcore_2",
    "vocab_topk",
    "bpe_pairs",
    "bigram_lm_perplexity",
    "random_projection",
    "sq8_adc_topk",
    "kg_snapshot_diff",
    "kg_random_walks",
    "skipgram_pairs",
    "winnow_overlap",
    "er_token_blocking",
    "temperature_mix",
    "cap_per_source",
    "negative_samples",
    "shard_layout",
    "kg_incremental_edges",
    "hll_distinct_spans",
    "cms_heavy_tokens",
    "bloom_prune_decisions",
    "quantile_doc_lengths",
    "substring_dedup_cut",
    "kg_incremental_cc",
    "chunk_sliding",
    "gopher_quality",
    "label_propagation",
    "semdedup",
    "suffix_ranks",
    "exact_dup_runs",
    "zorder_values",
    "dup_coverage",
    "clustering_coeff",
    "link_prediction",
    "line_dedup",
    "hits_kg",
    "bm25_topk",
    "pq_adc_topk",
    "scc_components",
    "dag_levels",
    "ktruss_3",
    "kmv_token_overlap",
    "pmi_collocations",
    "hyperball_balls",
    "scd2_history",
    "ppjoin_pairs",
    "weighted_sample",
    "kmv_join_size",
    "skew_report",
    "bpe_merges",
    "meta_blocking",
    "url_canonicalize",
    "crawl_schedule",
    "robots_gate",
    "subclass_closure",
    "kg_validation",
    "mis_conflict_free",
    "wl_refinement",
    "sorted_neighborhood",
    "rdfs_entailment",
    "semantic_similarity",
    "bgp_property_paths",
    "owl_entailment",
    "weighted_sssp",
    "kg_incremental_closure",
    "kg_incremental_entailment",
    "table_profile",
    "bgp_over_entailment",
    "kg_corrupt_triples",
    "linkpred_ranking",
    "er_fs_scoring",
    "schema_summary",
    "er_agreement_patterns",
    "blocking_eval",
    "bgp_aggregates",
    "bgp_construct",
    "cypher_var_length",
    "densest_subgraph",
    "modularity_communities",
    "node2vec_walks",
    "graph_coloring",
    "mine_expectations",
    "dbscan_embeddings",
    "katz_centrality",
    "entailment_provenance",
    "betweenness_sampled",
    "unigram_segment_cost",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="kgms-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    # gated + retired-from-gate registries: the bench suite keeps its
    # round-over-round comparability regardless of gate-cap shuffling
    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}
    # Untimed warm-up: JVM/codegen JIT, shuffle service, and the Python
    # worker pool (spark.python.worker.reuse keeps it) — the first timed
    # query previously absorbed several seconds of one-time startup that
    # a long-running production job pays once, not per query.
    force(qs["semi_join"](spark, SF_DIR))
    force(qs["triples_extract"](spark, SF_DIR))
    # Machine-speed reference: a fixed pure-JVM codegen canary (same
    # job as scripts/scaling_run.py). Absolute query timings ride the
    # sandbox's clock/tenancy drift — measured 4.0 s vs 5.4 s for THIS
    # canary across two otherwise-idle windows a day apart (±25%);
    # the canary in the output lets rounds be compared speed-normalized.
    from pyspark.sql import functions as _F

    def _canary() -> float:
        h = _F.col("id")
        for i in range(8):
            h = _F.xxhash64(h, _F.lit(i))
        job = (
            spark.range(0, 40_000_000 * CPUS, 1, CPUS * 4)
            .select(h.alias("h"))
            .agg(_F.expr("bit_xor(h)").alias("s"))
        )
        t0 = time.monotonic()
        job.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    _canary()  # codegen/JIT warm-up
    jvm_canary_sec = round(min(_canary() for _ in range(2)), 3)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        # GC barrier: without it, heap garbage from earlier queries
        # triggers full-GC pauses inside later timed windows — observed
        # 4-5× single-query inflation late in the suite, pure noise
        spark._jvm.System.gc()
        t0 = time.monotonic()
        force(qs[name](spark, SF_DIR))
        timings[name] = round(time.monotonic() - t0, 3)

    # North-star throughput: HTML extract → SVO triples over a
    # pre-materialized corpus (synthesis is not part of the measured
    # path — a production run reads the crawl from Iceberg/parquet).
    import shutil
    import tempfile

    corpus_dir = tempfile.mkdtemp(prefix="bench_corpus_")
    generate_corpus(spark, N_DOCS_PIPELINE, seed=42).write.mode("overwrite").parquet(
        corpus_dir
    )
    corpus = spark.read.parquet(corpus_dir)
    # fused single-Arrow-hop stage (functions/triples.py) — row-identical
    # to the two-UDF path (pytest-proven), one Python hop instead of two
    triples = triples_from_corpus(corpus)
    # warm-up over a sample spanning every input split: spins up the full
    # Python worker pool + JIT before the steady-state measurement (a
    # production job runs hours; worker spin-up is not the unit cost)
    triples_from_corpus(corpus.sample(0.05, seed=1)).count()
    # best-of-5: this machine shows sporadic multi-second interference
    # bursts (identical back-to-back runs measured 0.7 s vs 7.6 s); the
    # minimum is the engine's capability, the per-run list is published
    # so the noise is visible (same protocol as scripts/scaling_bench)
    pipeline_runs = []
    n_triples = 0
    for _ in range(5):
        t0 = time.monotonic()
        n_triples = triples.count()
        pipeline_runs.append(round(time.monotonic() - t0, 3))
    pipeline_sec = min(pipeline_runs)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    timings["webkg_extract_triples"] = round(pipeline_sec, 3)
    triples_per_sec = n_triples / pipeline_sec if pipeline_sec > 0 else 0.0

    sf = 0.1
    if "sf0.01" in SF_DIR:
        sf = 0.01
    elif "sf0.001" in SF_DIR:
        sf = 0.001
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "triples_per_sec": round(triples_per_sec, 1),
        "n_triples": n_triples,
        "pipeline_docs": N_DOCS_PIPELINE,
        "pipeline_runs_sec": pipeline_runs,
        "jvm_canary_sec": jvm_canary_sec,
        "cpus": CPUS,
    }
    # attach the last two-parallelism scaling measurement (produced
    # separately by scripts/scaling_bench.py — see BENCH/BASELINE.md for
    # protocol); clearly labeled as its own measurement, not this run's
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling_last.json"
    )
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            out["scaling_measurement"] = json.load(f)
    # cross-window summary over EVERY archived measurement (the single
    # latest window under-/over-states a distribution this machine's
    # co-tenancy makes wide — BENCH/BASELINE.md renders the full table)
    windows_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH",
        "scaling_windows.jsonl",
    )
    # measured memory-bandwidth roofline (scripts/membw_probe.py): the
    # machine's own triad-bandwidth scaling bounds any bandwidth-bound
    # workload's pair efficiency — the closed-case attribution for the
    # 8->32 pair (see BENCH/BASELINE.md)
    roofline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH",
        "membw_roofline.json",
    )
    if os.path.exists(roofline_path):
        with open(roofline_path) as f:
            r = json.load(f)
        out["membw_roofline"] = {
            "triad_gb_per_sec_best": r.get("triad_gb_per_sec"),
            "bandwidth_bound_pair_ceiling": r.get(
                "bandwidth_bound_pair_ceiling"
            ),
            "measured_at": r.get("measured_at"),
        }
    if os.path.exists(windows_path):
        with open(windows_path) as f:
            wins = [json.loads(l) for l in f if l.strip()]
        summary = {}
        for pair in ("2->8", "8->32"):
            raw = [w.get("pair_efficiencies", {}).get(pair) for w in wins]
            raw = [r for r in raw if r is not None]
            norm = [
                w.get("control_normalized_pair_efficiencies", {}).get(pair)
                for w in wins
            ]
            norm = [x for x in norm if x is not None]
            if raw:
                summary[pair] = {
                    "windows": len(raw),
                    "raw_min": min(raw),
                    "raw_max": max(raw),
                    "raw_pass_0.8": sum(1 for r in raw if r >= 0.8),
                    "norm_min": min(norm) if norm else None,
                    "norm_max": max(norm) if norm else None,
                }
        out["scaling_windows_summary"] = summary
    print(json.dumps(out))


if __name__ == "__main__":
    main()
