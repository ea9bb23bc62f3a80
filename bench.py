"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the flagship KG pipeline over synthetic transcripts
(~100k turns; long-conversation skew included) plus the heavy dataprep
operators over the sf tables. `value` is total wall seconds across the
headline queries; extra keys report turns/sec for the pipeline.

Scaling evidence (north_rule: efficiency >= 0.8 from N to 4N): run
``python bench.py --scaling`` — executes the full pipeline at
local[SCALING_LEVELS[0]] and local[SCALING_LEVELS[1]] (N and 4N cores)
in fresh subprocesses on identical input, min-of-k per level, and
appends throughputs + the efficiency ratio to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# module-level on purpose: function-local pandas + postponed annotations
# breaks @pandas_udf typehint inference (see _sf1_cipher_udf)
import pandas as pd

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
    from information_extraction_for_chinese_nlp_spark.operators.dedup import (
        simhash_near_pairs,
        simhash_near_pairs_wide,
    )
    from information_extraction_for_chinese_nlp_spark.operators.similarity import (
        ann_topk,
        brute_force_topk,
        ivf_topk,
        matmul_topk,
    )
    from information_extraction_for_chinese_nlp_spark.operators.textstats import (
        quality_features,
        repetition_features,
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

    queries = emb.filter(F.col("vec_id") < 100)
    cc_state = _cc_setup(spark)
    ivf_state = _ivf_setup(emb)
    ld_docs = _line_dedup_fixture(spark, n_docs=20_000, n_hot=100_000)
    return {
        "q1_triples": lambda: extract_triples(transcripts).count(),
        # banded LSH (b=2, r=2): same 4-hash budget as round 1, real
        # recall; max_bucket caps degenerate exact-dup clusters (one
        # sf0.1 cluster alone yields 7M of 7.5M pairs — dedup_exact's
        # job, not the near-dup detector's) — the setting a 100 TB run
        # needs, same story as q3's max_df
        "q2_dedup_minhash": lambda: minhash_lsh_pairs(
            docs, n_bands=2, rows_per_band=2, max_bucket=1000
        ).count(),
        # the 100 TB signature budget (64 hashes, b=16×r=4) on the
        # vectorized path: per-partition md5 minima, shuffle input =
        # n_bands rows/doc instead of tokens×64 exploded rows
        "q2c_minhash_vec_b16r4": lambda: minhash_lsh_pairs(
            docs, n_bands=16, rows_per_band=4, max_bucket=1000, vectorized=True
        ).count(),
        # max_df caps hot shingles — the setting the 100 TB run needs
        # (an uncapped hot shingle contributes O(df²) candidate pairs)
        "q3_ngram_jaccard": lambda: ngram_jaccard_pairs(
            docs, n=3, threshold=0.1, max_df=100
        ).count(),
        "q4_simhash": lambda: simhash(docs).count(),
        # banded Hamming pairs (pigeonhole recall 1.0 at distance <= 3)
        "q4b_simhash_pairs": lambda: simhash_near_pairs(
            docs, max_hamming=3, max_bucket=1000
        ).count(),
        # 64-bit fingerprints on the vectorized path (memoized token
        # bit-votes, no tokens×64 explode through the shuffle)
        "q4c_simhash64_vec": lambda: simhash_near_pairs_wide(
            docs, n_bands=8, max_hamming=7, max_bucket=1000, vectorized=True
        ).count(),
        "q5_bruteforce_topk": lambda: brute_force_topk(emb, queries, k=10).count(),
        # exact search, vectorized: per-partition numpy matmul + local
        # top-k, global rank on the bounded candidate set
        "q5d_matmul_topk": lambda: matmul_topk(emb, queries, k=10).count(),
        # the actual ANN scale paths, timed as headline queries
        "q5b_lsh_ann": lambda: ann_topk(
            emb, queries, k=10, n_planes=6, max_hamming=1
        ).count(),
        "q5c_ivf_ann": lambda: ivf_topk(
            emb, queries, k=10, n_cells=16, n_probe=4
        ).count(),
        # the steady-state IVF shape: the index builds ONCE (setup, like
        # a persisted TableIO index) and only the search is timed —
        # q5c above re-fits KMeans per invocation, which overstates the
        # per-query cost of the scale path
        "q5c2_ivf_search_only": lambda: _ivf_search_count(ivf_state, queries),
        # q5c is KMeans-fit-dominated; the sampled fit (deterministic
        # md5 10% sample, same centroider) cuts the per-iteration
        # full-corpus passes ~10x while the recall bar is pytest-pinned
        # — compare directly against q5c (identical search stage)
        "q5c3_ivf_sampled_fit": lambda: ivf_topk(
            emb, queries, k=10, n_cells=16, n_probe=4, fit_fraction=0.1
        ).count(),
        "q6_quality": lambda: quality_features(docs).count(),
        # Gopher-style repetition filters: the bigram aggregate is the
        # module's one deliberate shuffle (linear in doc length)
        "q6b_repetition": lambda: repetition_features(docs).count(),
        "q7_graph": lambda: _graph_count(spark, docs),
        # the COMPLETE KG tail (extract -> link -> canonicalize -> FUSE
        # per canonical fact): one extra map-combinable shuffle over q7
        # plus the post-agg canonical_text join; build_kg's checkpoint
        # keeps linker+CC at one execution for both outputs
        "q7b_kg_fused": lambda: _kg_fused_count(spark, docs),
        # the COMPOSED curation job (dedup -> decontaminate -> quality
        # -> PII scrub -> stratified sample) as one plan — the 100 TB
        # story is this composition, not the stages singly (VERDICT r4
        # task 5); plan audit in PLANS.md
        "q8_dataprep": lambda: _dataprep_count(spark, docs),
        # mention-heavy entity linking on the vectorized TF-IDF scorer:
        # 200k candidate pairs, 2k distinct surfaces — the shape where
        # per-pair Python used to be the slowest surviving inner loop
        "q9_linker_tfidf": lambda: _linker_count(spark),
        # same fixture through the fully-distributed scorer (Spark-side
        # IDF fit, no driver collect/cap). Expected ~2-3x slower HERE:
        # it pays a mention-side explode+groupBy shuffle the UDF path
        # doesn't, buying the unbounded-dictionary contract — the UDF
        # path stays the default under the curated-dict cap, the
        # distributed path is the escape hatch past it (measured 1.3s
        # vs 3.3s at this fixture; both paths share one oracle)
        "q9b_linker_tfidf_dist": lambda: _linker_count(
            spark, scorer="tfidf_distributed"
        ),
        # incremental CC vs full recompute on the same union graph: the
        # fold's wall-time must track the 1% batch, not the accumulated
        # graph (VERDICT r4 task 6); prev_labels precomputed once in
        # setup (= the persisted state a real ingest run reads)
        "q10_cc_full": lambda: _cc_full(spark, cc_state).count(),
        "q10b_cc_incremental": lambda: _cc_incremental(cc_state).count(),
        # corpus line-dedup with a 100k-line hot set: auto dispatches to
        # the frozenset pandas-UDF leg (O(1) probe per line, zero corpus
        # shuffle) — the in-row array scan this replaced is O(|hot|) per
        # LINE and measured ~two orders slower here (BASELINE.md A/B,
        # `python bench.py --line-dedup-ab`)
        "q11_line_dedup_hot1e5": lambda: _line_dedup_force(ld_docs),
        # iterative graph analytics at corpus-independent scale: 3
        # PageRank rounds over a deterministic 2M-edge graph (200k
        # nodes, 10% of edges funneled into 100 hubs — the skew case).
        # Per-round cost is the rank-vector shuffle only; the edge
        # table is partitioned + lineage-cut once in the operator
        "q12_pagerank_2m": lambda: _pagerank_count(spark),
    }


def _pagerank_count(spark):
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.centrality import (
        pagerank,
    )

    n_edges, n_nodes, n_hubs = 2_000_000, 200_000, 100
    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("src"),
        F.when(
            F.col("id") % 10 == 0, F.pmod(F.col("id"), F.lit(n_hubs))
        )
        .otherwise(F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_nodes)))
        .alias("dst"),
    )
    # a ring guarantees every node an out-edge: the hashed src column
    # leaves ~9 of 200k nodes dangling by chance, and the key should
    # time the pure lazy-chain propagation path, not the per-round
    # dangling materialization
    ring = spark.range(n_nodes).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % n_nodes).alias("dst"),
    )
    return pagerank(edges.unionByName(ring), max_iter=3).count()


def _graph_count(spark, docs):
    from information_extraction_for_chinese_nlp_spark.plans.graph import build_graph
    from information_extraction_for_chinese_nlp_spark.plans.pipeline import (
        extract_triples,
    )
    from information_extraction_for_chinese_nlp_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    # mirror scripts/run_pipeline.py: edges are MATERIALIZED (warehouse
    # snapshot there, lazy localCheckpoint here — first action runs the
    # extraction once) before graph construction; passing the lazy
    # frame re-executes the mapInPandas extraction for every downstream
    # reference (build_graph consumes it 3x: linker pairs + the keyed
    # join + the two output counts)
    edges = extract_triples(transcripts_from_documents(docs)).localCheckpoint(
        eager=False
    )
    vertices, canonical = build_graph(edges)
    return vertices.count() + canonical.count()


def _kg_fused_count(spark, docs):
    from information_extraction_for_chinese_nlp_spark.plans.graph import build_kg
    from information_extraction_for_chinese_nlp_spark.plans.pipeline import (
        extract_triples,
    )
    from information_extraction_for_chinese_nlp_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    # same materialization discipline as q7 (see _graph_count)
    edges = extract_triples(transcripts_from_documents(docs)).localCheckpoint(
        eager=False
    )
    vertices, fused = build_kg(edges)
    return vertices.count() + fused.count()


def _dataprep_count(spark, docs):
    """Composed curation job: dedup -> decontaminate -> quality filter
    -> PII scrub -> stratified sample as ONE plan via operators.curation
    (inline expressions + lazy-checkpoint boundaries — the naive
    join-back composition re-scanned the corpus 60x; see PLANS.md).
    Eval set = every 97th doc (the decontaminate gate's convention)."""
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.curation import (
        curate,
    )

    eval_docs = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    out = curate(
        docs, eval_docs=eval_docs, decontam_n=8, min_quality=0.2,
        sample_fractions={}, default_fraction=0.5,
        n_bands=2, rows_per_band=2, max_bucket=1000,
    )
    return out.count()


def _linker_count(spark, scorer="tfidf"):
    """Mention-heavy TF-IDF linking: 200k candidate pairs over 2k
    distinct money surfaces — the fixture where the old per-pair Python
    scorer was the slowest surviving inner loop (VERDICT r4 task 1)."""
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.linking import (
        link_entities,
    )

    aliases = spark.range(2000).select(
        F.concat(F.format_string("%d", F.col("id") * 137 + 1000), F.lit("元")).alias("alias"),
        F.concat(F.lit("E"), F.col("id")).alias("canonical_id"),
        F.concat(F.lit("醫療費用#"), (F.col("id") * 137 + 1000).cast("string")).alias("block_key"),
    )
    mentions = spark.range(200_000).select(
        F.concat(F.lit("m"), F.col("id")).alias("mention_id"),
        F.lit("醫療費用").alias("pred"),
        # comma-separated surface of the same value -> same block, the
        # scorer sees a non-identical but high-overlap surface
        F.concat(
            F.format_string("%,d", (F.col("id") % 2000) * 137 + 1000), F.lit("元")
        ).alias("obj"),
    )
    return link_entities(mentions, aliases, scorer=scorer, threshold=0.3).count()


# incremental-CC fixture: 500k nodes in chains of 8 (~437k edges base),
# 1% batch of cross-chain edges folded in
CC_NODES = int(os.environ.get("BENCH_CC_NODES", "500000"))


def _ivf_setup(emb):
    """Fit the IVF index ONCE (the persisted-index steady state)."""
    from information_extraction_for_chinese_nlp_spark.operators.similarity import (
        ivf_assignments,
    )

    assigned, centroids = ivf_assignments(emb, n_cells=16)
    return {"assigned": assigned.localCheckpoint(eager=True),
            "centroids": centroids}


def _ivf_search_count(state, queries):
    from information_extraction_for_chinese_nlp_spark.operators.similarity import (
        ivf_search,
    )

    return ivf_search(
        state["assigned"], state["centroids"], queries, k=10, n_probe=4
    ).count()


def _line_dedup_fixture(spark, n_docs: int, n_hot: int):
    """Deterministic boilerplate corpus: each doc has 15 hot lines drawn
    from an ``n_hot``-value vocabulary (slot s = doc*15+j maps to value
    s % n_hot, so every value lands in exactly 15*n_docs/n_hot distinct
    docs — >= min_df=3 at the bench shape) + 15 unique lines."""
    from pyspark.sql import functions as F

    hot_cols = [
        F.format_string("BP%d", (F.col("id") * 15 + j) % n_hot)
        for j in range(15)
    ]
    uniq_cols = [
        F.format_string("U%d-" + str(j), F.col("id")) for j in range(15)
    ]
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws("\n", *hot_cols, *uniq_cols).alias("text"),
        )
        .localCheckpoint(eager=True)
    )


def _line_dedup_force(docs, **kw) -> int:
    """Run line_dedup and force FULL evaluation (a bare count() would
    let column pruning skip the rewritten text entirely)."""
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.dedup import (
        line_dedup,
    )

    row = (
        line_dedup(docs, min_df=3, **kw)
        .agg(F.sum(F.length("text")), F.sum("n_dropped").alias("nd"))
        .collect()[0]
    )
    return int(row["nd"])


def run_line_dedup_ab() -> None:
    """|hot|-scaling A/B (VERDICT r6 task 1 evidence): per-doc cost of
    the in-row array scan grows linearly with the hot-set size, while
    the hashset-UDF and relational legs stay flat. Appends the table to
    BASELINE.md."""
    from information_extraction_for_chinese_nlp_spark.session import get_spark

    spark = get_spark("line-dedup-ab", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    results: dict[tuple[int, str], float] = {}
    for n_hot in (10_000, 100_000):
        docs = _line_dedup_fixture(spark, n_docs=20_000, n_hot=n_hot)
        for strat in ("inrow", "hashset", "relational"):
            best = float("inf")
            iters = 1 if strat == "inrow" else BENCH_ITERS
            for _ in range(iters):
                t0 = time.time()
                _line_dedup_force(docs, strategy=strat)
                best = min(best, time.time() - t0)
            results[(n_hot, strat)] = round(best, 2)
            print(json.dumps({"n_hot": n_hot, "strategy": strat,
                              "sec": results[(n_hot, strat)]}))
    spark.stop()
    lines = [
        "",
        "## line_dedup membership-cost A/B (20k docs x 30 lines; "
        "hashset/relational min-of-k, inrow single-run)",
        "",
        "| strategy | hot=10k sec | hot=100k sec | 10x-hot cost ratio |",
        "| --- | --- | --- | --- |",
    ]
    for strat in ("inrow", "hashset", "relational"):
        a, b = results[(10_000, strat)], results[(100_000, strat)]
        lines.append(f"| {strat} | {a} | {b} | {b / a:.2f}x |")
    lines += [
        "",
        "The in-row `array_contains` scan pays O(|hot|) per line; the",
        "frozenset-UDF and broadcast-join legs are O(1) per line and flat",
        "in |hot| — auto dispatch uses inrow only below "
        "`inrow_hot_limit` (default 2k).",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))


def run_line_dedup_oversized() -> None:
    """Oversized-hot-set A/B (VERDICT r7 task 1 evidence): the
    relational leg at a hot set of 1M distinct lines — 10x the r6 A/B's
    100k and at the default broadcast-budget boundary — WITH the
    F.broadcast hint vs WITHOUT it (broadcast_hot_limit=0, the plan auto
    takes past the budget). Proves the escape hatch is genuinely
    unbounded: the unhinted plan completes with identical drop counts,
    paying one extra line-key exchange. Appends the table to
    BASELINE.md."""
    from information_extraction_for_chinese_nlp_spark.session import get_spark

    spark = get_spark("line-dedup-oversized", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    # 200k docs x 15 hot slots / 1M values = every hot value in exactly
    # 3 distinct docs = min_df boundary; 6M total lines
    docs = _line_dedup_fixture(spark, n_docs=200_000, n_hot=1_000_000)
    results: dict[str, float] = {}
    drops: dict[str, int] = {}
    legs = {"relational_bcast": {}, "relational_shuffle":
            {"broadcast_hot_limit": 0}}
    for leg, kw in legs.items():
        best = float("inf")
        for _ in range(BENCH_ITERS):
            t0 = time.time()
            nd = _line_dedup_force(docs, strategy="relational", **kw)
            best = min(best, time.time() - t0)
        results[leg], drops[leg] = round(best, 2), nd
        print(json.dumps({"leg": leg, "sec": results[leg],
                          "n_dropped": nd}))
    assert drops["relational_bcast"] == drops["relational_shuffle"], drops
    spark.stop()
    a, b = results["relational_bcast"], results["relational_shuffle"]
    lines = [
        "",
        "## line_dedup oversized-hot-set A/B (200k docs x 30 lines, "
        "|hot|=1M distinct lines; min-of-%d)" % BENCH_ITERS,
        "",
        "| leg | sec | n_dropped |",
        "| --- | --- | --- |",
        f"| relational + broadcast hint | {a} | {drops['relational_bcast']} |",
        f"| relational, no hint (AQE shuffle join) | {b} | "
        f"{drops['relational_shuffle']} |",
        "",
        f"Unhinted/hinted wall ratio {b / a:.2f}x (identical n_dropped).",
        "Past `broadcast_hot_limit` the leg drops the hint, so the",
        "escape hatch no longer re-imposes the cap it exists to escape.",
        "Locally the unhinted plan can WIN (the line-key exchange is an",
        "intra-box copy; the hinted plan pays a driver-side HashedRelation",
        "build + broadcast); the 4M-row default stays cluster-sized, where",
        "re-shuffling the corpus-sized exploded side over the network",
        "dwarfs a <=~100 MB hot-set broadcast.",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))


def run_ann_ab() -> None:
    """q5b plan-shape A/B (VERDICT r6 task 4): single-pass ann_topk
    (vector rides through the bucket projection) vs the two-scan
    join-back shape (buckets computed narrow, vectors re-attached by an
    id-keyed join — which re-executes the corpus scan for the second
    alias AND pays an exchange). Parquet-backed corpora at sf1-scale
    (20k vectors, 10x the sf0.1 embeddings table) and 10x that, so the
    scan-count difference is real I/O. Appends the table to BASELINE.md.
    """
    import tempfile

    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.similarity import (
        ann_topk,
        ann_topk_two_scan,
    )
    from information_extraction_for_chinese_nlp_spark.session import get_spark

    spark = get_spark("ann-ab", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    results: dict[tuple[int, str], float] = {}
    rows_check: dict[tuple[int, str], int] = {}
    with tempfile.TemporaryDirectory() as td:
        for n_vecs in (20_000, 200_000):
            path = os.path.join(td, f"emb{n_vecs}")
            spark.range(n_vecs).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(31)),
                    lambda d: (
                        F.pmod(F.xxhash64(F.col("id"), d), 1000) / 1000.0
                        + (F.pmod(F.col("id"), 16) == F.pmod(d, 16)).cast(
                            "double"
                        )
                        * 2.0
                    ),
                ).alias("embedding"),
            ).write.mode("overwrite").parquet(path)
            corpus = spark.read.parquet(path)
            queries = corpus.filter(F.col("vec_id") < 100)
            for label, fn in (("single_pass", ann_topk),
                              ("two_scan", ann_topk_two_scan)):
                best = float("inf")
                for _ in range(BENCH_ITERS):
                    t0 = time.time()
                    n = fn(corpus, queries, k=10, n_planes=6,
                           max_hamming=1).count()
                    best = min(best, time.time() - t0)
                results[(n_vecs, label)] = round(best, 2)
                rows_check[(n_vecs, label)] = n
                print(json.dumps({"n_vecs": n_vecs, "shape": label,
                                  "sec": results[(n_vecs, label)],
                                  "rows": n}))
            assert (rows_check[(n_vecs, "single_pass")]
                    == rows_check[(n_vecs, "two_scan")])
    spark.stop()
    lines = [
        "",
        "## ann_topk plan-shape A/B: single-pass vs two-scan join-back "
        "(parquet corpus, min-of-k)",
        "",
        "| corpus | single-pass sec | two-scan sec | two-scan / single |",
        "| --- | --- | --- | --- |",
    ]
    for n_vecs in (20_000, 200_000):
        a = results[(n_vecs, "single_pass")]
        b = results[(n_vecs, "two_scan")]
        lines.append(f"| {n_vecs} vecs (sf{n_vecs // 20000}) | {a} | {b} "
                     f"| {b / a:.2f}x |")
    lines += [
        "",
        "Both shapes return identical rows; the two-scan shape re-reads",
        "the corpus parquet for the join-back alias and adds an id-keyed",
        "exchange.",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))


def run_skew_ab() -> None:
    """Skew stress for the pair generators (VERDICT r6 task 6): a
    Zipfian template corpus (bucket sizes follow a power law, one giant
    hot template) vs a uniform-template corpus of identical size,
    through minhash_lsh_pairs and simhash_near_pairs with caps ON. The
    p99/max bucket Observations + drop counts land in BASELINE.md and
    the skewed run must stay within 2x of the uniform wall (the cap is
    what bounds the hot bucket's O(size^2) pair expansion)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_near_pairs,
    )
    from information_extraction_for_chinese_nlp_spark.session import get_spark

    spark = get_spark("skew-ab", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    n_docs = 20_000
    n_templates = 5_000

    def corpus(zipf: bool):
        if zipf:
            # inverse-power transform of a uniform md5 unit: template
            # ranks follow ~rank^-1.25 — one template covers a large
            # fraction of the corpus, the stress case for banding
            u = (F.pmod(F.xxhash64(F.col("id")), 1_000_000) + 1) / 1_000_000.0
            tpl = F.least(
                F.floor(F.pow(u, F.lit(-1.25))), F.lit(n_templates)
            ).cast("long")
        else:
            tpl = (F.pmod(F.xxhash64(F.col("id")), n_templates) + 1).cast("long")
        # 25 shared template tokens + 5 doc-unique tokens: same-template
        # docs are ~0.83-Jaccard near-dups, cross-template docs disjoint
        toks = [F.format_string("T%dw" + str(j), tpl) for j in range(25)]
        toks += [F.format_string("u%dw" + str(j), F.col("id")) for j in range(5)]
        return (
            spark.range(n_docs)
            .select(F.col("id").alias("doc_id"),
                    F.concat_ws(" ", *toks).alias("text"))
            .localCheckpoint(eager=True)
        )

    results: dict[tuple[str, str], dict] = {}
    for dist in ("uniform", "zipf"):
        docs = corpus(dist == "zipf")
        for gen in ("minhash", "simhash"):
            best, metrics = float("inf"), {}
            for _ in range(BENCH_ITERS):
                obs = Observation(f"{dist}-{gen}")
                t0 = time.time()
                if gen == "minhash":
                    n = minhash_lsh_pairs(
                        docs, n_bands=2, rows_per_band=2, max_bucket=1000,
                        observation=obs,
                    ).count()
                else:
                    n = simhash_near_pairs(
                        docs, max_hamming=3, max_bucket=1000, observation=obs,
                    ).count()
                wall = time.time() - t0
                if wall < best:
                    best, metrics = wall, dict(obs.get)
            results[(dist, gen)] = {
                "sec": round(best, 2), "pairs": n,
                "max_bucket": int(metrics.get("max_bucket_size") or 0),
                "p99_bucket": int(metrics.get("p99_bucket_size") or 0),
                "dropped_buckets": int(metrics.get("dropped_buckets") or 0),
                "dropped_ids": int(metrics.get("dropped_ids") or 0),
            }
            print(json.dumps({"dist": dist, "gen": gen,
                              **results[(dist, gen)]}))
    spark.stop()
    lines = [
        "",
        f"## Pair-generator skew stress ({n_docs} docs, Zipf vs uniform "
        "templates, caps=1000, min-of-k)",
        "",
        "| generator | corpus | sec | pairs | max bucket | p99 bucket "
        "| dropped buckets | dropped ids |",
        "| --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    ratios = []
    for gen in ("minhash", "simhash"):
        for dist in ("uniform", "zipf"):
            r = results[(dist, gen)]
            lines.append(
                f"| {gen} | {dist} | {r['sec']} | {r['pairs']} "
                f"| {r['max_bucket']} | {r['p99_bucket']} "
                f"| {r['dropped_buckets']} | {r['dropped_ids']} |"
            )
        ratio = results[("zipf", gen)]["sec"] / results[("uniform", gen)]["sec"]
        ratios.append(f"{gen}: zipf/uniform wall = {ratio:.2f}x")
        assert ratio <= 2.0, (
            f"{gen} skewed wall {ratio:.2f}x uniform — cap failed to "
            "bound the hot bucket"
        )
    lines += ["", *ratios,
              "",
              "The hot template's over-cap bucket is dropped AND counted "
              "(never silent); the n_bands sizing rule holds p99 well "
              "under the cap on the uniform corpus.",
              ""]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))


def _cc_setup(spark, n_nodes: int | None = None):
    """Build the accumulated-graph state ONCE (outside the timed
    queries): base edges, converged labels (what a real ingest run reads
    from its persisted vertex table), and the 1% new-edge batch."""
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.components import (
        connected_components,
    )

    n_nodes = n_nodes or CC_NODES
    ids = spark.range(n_nodes)
    base = ids.filter((F.col("id") % 8) != 7).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    batch = spark.range(n_nodes // 100).select(
        (F.col("id") * 16).alias("src"),
        (F.col("id") * 16 + 8).alias("dst"),
    )
    prev = connected_components(base, pointer_jump=True).localCheckpoint(eager=True)
    base = base.localCheckpoint(eager=True)
    batch = batch.localCheckpoint(eager=True)
    return {"base": base, "batch": batch, "prev": prev}


def _cc_full(spark, state):
    from information_extraction_for_chinese_nlp_spark.operators.components import (
        connected_components,
    )

    # chain-shaped fixture (diameter ~8): the deep-graph configuration
    return connected_components(
        state["base"].union(state["batch"]), pointer_jump=True
    )


def _cc_incremental(state):
    from information_extraction_for_chinese_nlp_spark.operators.components import (
        merge_components,
    )

    return merge_components(state["prev"], state["batch"])


def n_turns_total() -> int:
    # mirror of synth_transcripts sizing: every 100th conv has 500 turns
    long_convs = (N_CONVS + 99) // 100
    return (N_CONVS - long_convs) * TURNS + long_convs * 500


BENCH_ITERS = int(os.environ.get("BENCH_ITERS", "3"))


def run_bench() -> dict:
    from information_extraction_for_chinese_nlp_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    queries = build_queries(spark)
    timings: dict[str, float] = {}
    # min-of-k: this sandbox is co-tenant and single runs show 3-30x
    # outliers (neighbors/GC); the minimum measures actual capacity
    for name, fn in queries.items():
        best = float("inf")
        for _ in range(BENCH_ITERS):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
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


SCALING_CONVS = int(os.environ.get("BENCH_SCALING_CONVS", "480000"))
SCALING_TURNS = int(os.environ.get("BENCH_SCALING_TURNS", "48"))
SCALING_ITERS = int(os.environ.get("BENCH_SCALING_ITERS", "4"))
# N and 4N cores: 4 vs 16 leaves headroom on the 32-core box for JVM
# service threads (GC, shuffle, Arrow), which otherwise contend with
# task threads and cap measured scaling well below the hardware's
# (plain multiprocessing on this box scales 8->32 at efficiency 1.0).
SCALING_LEVELS = (4, 16)


def run_scaling_worker(cpus: int) -> None:
    """Child process: min-of-k timing of the full pipeline at local[cpus].

    min-of-k because this sandbox is co-tenant — single runs show 3-5x
    outliers from neighbors/GC; the minimum measures actual capacity,
    which is what the N-vs-4N comparison needs.
    """
    import time as _time

    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.plans.pipeline import (
        extract_triples,
    )
    from information_extraction_for_chinese_nlp_spark.session import get_spark
    from information_extraction_for_chinese_nlp_spark.sources.transcripts import (
        synth_transcripts,
    )

    spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.range(10000).select(F.sum("id")).collect()
    extract_triples(synth_transcripts(spark, n_convs=50, turns_per_conv=5)).count()
    t = synth_transcripts(
        spark, n_convs=SCALING_CONVS, turns_per_conv=SCALING_TURNS,
        long_conv_every=100, long_conv_turns=500,
    )
    times = []
    rows = 0
    for _ in range(SCALING_ITERS):
        t0 = _time.time()
        rows = extract_triples(t).count()
        times.append(_time.time() - t0)
    long_convs = (SCALING_CONVS + 99) // 100
    turns = (SCALING_CONVS - long_convs) * SCALING_TURNS + long_convs * 500
    print(json.dumps({"cpus": cpus, "times": [round(x, 2) for x in times],
                      "min_sec": round(min(times), 2), "rows": rows,
                      "turns": turns}))
    spark.stop()


def run_scaling() -> None:
    """N vs 4N cores on identical input; efficiency = (T_N/T_4N)/4."""
    results = {}
    for cpus in SCALING_LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-worker", str(cpus)],
            env=dict(os.environ), capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    n_lo, n_hi = SCALING_LEVELS
    t8 = results[n_lo]["min_sec"]
    t32 = results[n_hi]["min_sec"]
    turns = results[n_lo]["turns"]
    eff = (t8 / t32) / 4
    tp8 = turns / t8
    tp32 = turns / t32

    lines = [
        "",
        "## Measured scaling (this sandbox, N vs 4N cores)",
        "",
        f"Input: synthetic transcripts, {turns} turns "
        f"(convs={SCALING_CONVS}, turns/conv={SCALING_TURNS}, every 100th conv has "
        f"500 turns — the skew case); full triple-extraction pipeline "
        f"(assemble -> scrub -> fused chunk+score+decode -> threshold), "
        f"min of {SCALING_ITERS} runs per level (co-tenant sandbox).",
        "",
        "| parallelism | wall sec (min) | all runs | turns/sec |",
        "| --- | --- | --- | --- |",
        f"| local[{n_lo}] (N) | {t8:.2f} | {results[n_lo]['times']} | {tp8:.0f} |",
        f"| local[{n_hi}] (4N) | {t32:.2f} | {results[n_hi]['times']} | {tp32:.0f} |",
        "",
        f"Scaling efficiency (T_{n_lo} / T_{n_hi}) / 4 = **{eff:.2f}** (target >= 0.8).",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))
    print(json.dumps({"efficiency": round(eff, 3), "t8": t8, "t32": t32,
                      "turns_per_sec_8": round(tp8, 1),
                      "turns_per_sec_32": round(tp32, 1)}))


SF1_DIR = os.environ.get("BENCH_SF1_DIR", "/tmp/sf1_fixture")


def _sf1_cipher_udf(i: int):
    """Per-replica character substitution: rotate CJK codepoints within
    the unified block and ASCII letters/digits within their classes.
    A bijection on text, so each replica is an ISOMORPHIC copy of the
    sf0.1 corpus — n-gram Jaccard / simhash similarity WITHIN a replica
    is preserved exactly, while CROSS-replica shingle overlap drops to
    ~zero (only punctuation/whitespace grams survive). The 10x corpus
    therefore carries exactly 10x the near-dup pair structure — the
    linear-scaling fixture the ratio diagnostic needs. (The first cut
    appended a replica marker only: replicas stayed NEAR-duplicates of
    each other, so q3/q4c measured fixture-induced intra-cluster pair
    growth and shifted max_df pruning, not per-row cost.)"""
    from pyspark.sql import functions as F

    tbl: dict[int, int] = {}
    if i:
        for cp in range(0x4E00, 0xA000):
            tbl[cp] = 0x4E00 + ((cp - 0x4E00 + i * 2099) % 0x5200)
        for base, size in ((ord("a"), 26), (ord("A"), 26), (ord("0"), 10)):
            for k in range(size):
                tbl[base + k] = base + (k + i) % size

    @F.pandas_udf("string")
    def cipher(s: pd.Series) -> pd.Series:
        return s.str.translate(tbl) if tbl else s

    return cipher


def _build_sf1(spark) -> None:
    """Deterministic 10x fixture from the sf0.1 tables: each replica
    remaps ids into a disjoint range and rewrites the text through a
    per-replica substitution cipher (see ``_sf1_cipher_udf``) so the
    corpus is neither 10 exact copies (which would collapse into
    dedup_exact's job) nor 10 near-duplicate clusters (which would
    quadratically inflate near-dup candidate pairs and saturate the
    caps). A replica marker line keeps even punctuation-only texts
    distinct. Written as parquet so scans/pushdown behave exactly like
    the sf0.1 leg."""
    from functools import reduce

    from pyspark.sql import functions as F

    done = os.path.join(SF1_DIR, "_DONE")
    if os.path.exists(done):
        return
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    docs10 = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat(
                    _sf1_cipher_udf(i)(F.col("text")),
                    F.lit("\nREPLICA-%d" % i),
                ).alias("text"),
                "lang", "source", "n_chars",
            )
            for i in range(10)
        ],
    )
    docs10.write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "documents.parquet"))
    emb10 = reduce(
        lambda a, b: a.unionByName(b),
        [
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                "embedding", "label",
            )
            for i in range(10)
        ],
    )
    emb10.write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "embeddings.parquet"))
    open(done, "w").close()


def run_sf1() -> None:
    """VERDICT r6 task 3: one sf1.0 leg for the 5 most expensive keys,
    timed against a same-session sf0.1 leg so the ratio is same-load.
    A clean 10x input should land near 10x wall (+noise); ratios past
    ~12x flag a constant floor or super-linear term the sf0.1 table
    hides. Appends the table to BASELINE.md."""
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.dedup import (
        ngram_jaccard_pairs,
        simhash_near_pairs_wide,
    )
    from information_extraction_for_chinese_nlp_spark.operators.similarity import (
        ann_topk,
    )
    from information_extraction_for_chinese_nlp_spark.session import get_spark

    spark = get_spark("bench-sf1", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    _build_sf1(spark)

    def legs(docs, emb, cc_state):
        queries = emb.filter(F.col("vec_id") < 100)
        return {
            "q3_ngram_jaccard": lambda: ngram_jaccard_pairs(
                docs, n=3, threshold=0.1, max_df=100).count(),
            "q4c_simhash64_vec": lambda: simhash_near_pairs_wide(
                docs, n_bands=8, max_hamming=7, max_bucket=1000,
                vectorized=True).count(),
            "q5b_lsh_ann": lambda: ann_topk(
                emb, queries, k=10, n_planes=6, max_hamming=1).count(),
            "q8_dataprep": lambda: _dataprep_count(spark, docs),
            "q10_cc_full": lambda: _cc_full(spark, cc_state).count(),
        }

    results: dict[str, dict[str, float]] = {}
    for label, sfdir, cc_nodes in (
        ("sf0.1", SF_DIR, CC_NODES),
        ("sf1", SF1_DIR, CC_NODES * 10),
    ):
        docs = spark.read.parquet(os.path.join(sfdir, "documents.parquet"))
        emb = spark.read.parquet(os.path.join(sfdir, "embeddings.parquet"))
        cc_state = _cc_setup(spark, n_nodes=cc_nodes)
        for key, fn in legs(docs, emb, cc_state).items():
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            results.setdefault(key, {})[label] = round(best, 2)
            print(json.dumps({"leg": label, "key": key, "sec": round(best, 2)}))

    lines = [
        "",
        "## sf1.0 leg for the top-5 expensive keys (round 7; 10x cipher-replica",
        "fixture, same-session sf0.1 reference, min-of-2, local[%d])" % CPUS,
        "",
        "| key | sf0.1 | sf1 | ratio (10x data) |",
        "|---|---|---|---|",
    ]
    for key, r in results.items():
        ratio = r["sf1"] / r["sf0.1"] if r["sf0.1"] else float("nan")
        flag = " **> 12x**" if ratio > 12 else ""
        lines.append("| %s | %.2f | %.2f | %.1fx%s |" % (
            key, r["sf0.1"], r["sf1"], ratio, flag))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({k: v for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        run_scaling_worker(int(sys.argv[sys.argv.index("--scaling-worker") + 1]))
    elif "--scaling" in sys.argv:
        run_scaling()
    elif "--line-dedup-ab" in sys.argv:
        run_line_dedup_ab()
    elif "--line-dedup-oversized" in sys.argv:
        run_line_dedup_oversized()
    elif "--ann-ab" in sys.argv:
        run_ann_ab()
    elif "--skew-ab" in sys.argv:
        run_skew_ab()
    elif "--sf1" in sys.argv:
        run_sf1()
    else:
        print(json.dumps(run_bench()))
