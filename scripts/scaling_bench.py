"""Two-cluster-size scaling evidence (sandbox substitute per task rules):
run the identical pipeline on the identical seeded corpus at local[8]
and local[32] in separate JVMs, report absolute throughput at both plus
scaling efficiency = T(4N) / (4·T(N)), and write BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
LEVELS = (8, 32)


def main() -> None:
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

    n, four_n = LEVELS
    tp_n = results[n]["triples_per_sec"]
    tp_4n = results[four_n]["triples_per_sec"]
    eff = tp_4n / (4 * tp_n)
    summary = {
        "n_docs": N_DOCS,
        "levels": results,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — throughput + scaling evidence

Two-cluster-size rule (BASELINE.json north_rule) evidenced at two local
parallelism levels (no real cluster in this sandbox): the IDENTICAL
pipeline binary (corpus parquet → HTML text extraction (pandas UDF) →
SVO triple extraction (pandas UDF) → broadcast entity linking →
provenance-preserving KGX edge merge) on the IDENTICAL seeded corpus
({N_DOCS} documents, seed 42, 256 input files), measured end-to-end
wall-clock per level in a fresh JVM (warm-up excluded, both levels).

| parallelism | wall (s) | triples | triples/sec |
|---|---|---|---|
| local[{n}] (N) | {results[n]['wall_sec']} | {results[n]['n_triples']} | {tp_n} |
| local[{four_n}] (4N) | {results[four_n]['wall_sec']} | {results[four_n]['n_triples']} | {tp_4n} |

**Scaling efficiency T(4N)/(4·T(N)) = {eff:.3f}** (target ≥ 0.8,
BASELINE.json:2,14).

Reproduce: `python scripts/scaling_bench.py {N_DOCS}`
(raw JSON: `{json.dumps(summary)}`)
""")
    print("wrote /root/repo/BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
