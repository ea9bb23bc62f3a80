"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the flagship KG pipeline over synthetic transcripts
(~100k turns; long-conversation skew included) plus the heavy dataprep
operators over the sf tables. `value` is total wall seconds across the
headline queries; extra keys report turns/sec for the pipeline.

Scaling evidence (north_rule: efficiency >= 0.8 from N to 4N): run
``python bench.py --scaling`` — executes the pipeline at local[8] and
local[32] in fresh subprocesses on identical input and writes
BENCH/BASELINE.md with both throughputs and the efficiency ratio.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("BENCH_CONVS", "4000"))
TURNS = int(os.environ.get("BENCH_TURNS", "24"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def build_queries(spark):
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash,
    )
    from information_extraction_for_chinese_nlp_spark.operators.similarity import (
        brute_force_topk,
    )
    from information_extraction_for_chinese_nlp_spark.operators.textstats import (
        quality_features,
    )
    from information_extraction_for_chinese_nlp_spark.plans.pipeline import (
        extract_triples,
    )
    from information_extraction_for_chinese_nlp_spark.sources.transcripts import (
        synth_transcripts,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    transcripts = synth_transcripts(
        spark, n_convs=N_CONVS, turns_per_conv=TURNS,
        long_conv_every=100, long_conv_turns=500,
    )

    return {
        "q1_triples": lambda: extract_triples(transcripts).count(),
        "q2_dedup_minhash": lambda: minhash_lsh_pairs(docs, n_seeds=4).count(),
        "q3_ngram_jaccard": lambda: ngram_jaccard_pairs(docs, n=3, threshold=0.1).count(),
        "q4_simhash": lambda: simhash(docs).count(),
        "q5_ann_topk": lambda: brute_force_topk(
            emb, emb.filter(F.col("vec_id") < 100), k=10
        ).count(),
        "q6_quality": lambda: quality_features(docs).count(),
    }


def n_turns_total() -> int:
    # mirror of synth_transcripts sizing: every 100th conv has 500 turns
    long_convs = (N_CONVS + 99) // 100
    return (N_CONVS - long_convs) * TURNS + long_convs * 500


def run_bench() -> dict:
    from information_extraction_for_chinese_nlp_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    queries = build_queries(spark)
    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(SF_DIR),
        "cpus": CPUS,
        "pipeline_turns": n_turns_total(),
        "pipeline_turns_per_sec": round(n_turns_total() / timings["q1_triples"], 1),
    }


def run_scaling() -> None:
    """local[8] vs local[32] on identical input; efficiency = (T8/T32)/4."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    t8 = results[8]["queries"]["q1_triples"]
    t32 = results[32]["queries"]["q1_triples"]
    eff = (t8 / t32) / 4
    tp8 = results[8]["pipeline_turns"] / t8
    tp32 = results[32]["pipeline_turns"] / t32

    lines = [
        "",
        "## Measured scaling (this sandbox, local[8] vs local[32])",
        "",
        f"Input: synthetic transcripts, {results[8]['pipeline_turns']} turns "
        f"(N_CONVS={N_CONVS}, TURNS={TURNS}, skewed long convs included); "
        f"full triple-extraction pipeline (q1_triples).",
        "",
        "| parallelism | wall sec | turns/sec |",
        "| --- | --- | --- |",
        f"| local[8] (N) | {t8:.2f} | {tp8:.0f} |",
        f"| local[32] (4N) | {t32:.2f} | {tp32:.0f} |",
        "",
        f"Scaling efficiency (T_8 / T_32) / 4 = **{eff:.2f}** "
        f"(target >= 0.8).",
        "",
        "Full headline timings per parallelism:",
        "",
        f"- local[8]: `{json.dumps(results[8]['queries'])}`",
        f"- local[32]: `{json.dumps(results[32]['queries'])}`",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))
    print(json.dumps({"efficiency": round(eff, 3), "t8": t8, "t32": t32,
                      "turns_per_sec_8": round(tp8, 1),
                      "turns_per_sec_32": round(tp32, 1)}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
