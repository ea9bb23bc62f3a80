"""E2 — training-data conversion lifecycle (reference run_convert.py):
Label Studio annotations -> regularized documents -> prompt-expanded,
chunked model-input records -> train/dev/test splits.

Differences from the reference, by design:
- invalid records (non-NER annotation type, bad spans) route to a
  quarantine frame instead of aborting the whole file
  (reference raises ValueError at utils/json_utils.py:54-58);
- the split is exact-count and deterministic (global row_number over a
  seeded hash order) rather than an in-memory permutation — same
  80/10/10 cut-point arithmetic as run_convert.py:29-44.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.chunking import explode_chunks
from ..functions.text import regularize_udf


def parse_labelstudio(raw: DataFrame) -> Tuple[DataFrame, DataFrame]:
    """D2 -> (documents-with-spans, quarantine).

    Expects the Label Studio export schema:
      id, data.text, annotations[0].result[]: {type, value:{start,end,text,labels[]}}
    Only ``type == 'labels'`` (NER) is valid — others quarantine
    (reference utils/json_utils.py:54-58).
    """
    flat = raw.select(
        F.col("id").cast("string").alias("doc_id"),
        F.col("data.text").alias("text"),
        # try_element_at: annotations = [] (exported but never annotated)
        # must yield NULL results -> empty spans, not the ANSI
        # INVALID_ARRAY_INDEX_IN_ELEMENT_AT that element_at throws under
        # Spark 4 defaults, killing the whole import
        F.try_element_at("annotations", F.lit(1))["result"].alias("_results"),
    )
    exploded = flat.select(
        "doc_id", "text", F.explode_outer("_results").alias("r")
    )
    # NULL-safe: a result with type=NULL must quarantine, not vanish
    # (plain `!=` would evaluate to NULL and drop it from both frames)
    bad = exploded.filter(
        F.col("r").isNotNull()
        & ~F.col("r.type").eqNullSafe("labels")
    ).select("doc_id", F.col("r.type").alias("bad_type"))

    good = exploded.filter(
        F.col("r").isNull() | F.col("r.type").eqNullSafe("labels")
    )
    spans = good.groupBy("doc_id", "text").agg(
        F.array_sort(
            F.collect_list(
                # when() -> NULL for annotation-less docs; collect_list
                # skips NULLs, so those docs get an empty spans array
                # instead of a struct of nulls.
                F.when(
                    F.col("r").isNotNull(),
                    F.struct(
                        F.col("r.value.start").alias("start"),
                        F.col("r.value.end").alias("end"),
                        F.col("r.value.text").alias("text"),
                        F.try_element_at(
                            F.col("r.value.labels"), F.lit(1)
                        ).alias("label"),
                    ),
                )
            )
        ).alias("spans")
    )
    # drop docs that had any invalid annotation
    docs = spans.join(bad.select("doc_id").distinct(), on="doc_id", how="left_anti")
    return docs, bad


def regularize_documents(docs: DataFrame) -> DataFrame:
    """P2 over the document+spans frame (span-preserving scrub)."""
    reg = docs.withColumn("_r", regularize_udf(F.col("text"), F.col("spans")))
    return reg.select(
        "doc_id",
        F.col("_r.text").alias("text"),
        F.col("_r.spans").alias("spans"),
    )


def to_model_input(docs: DataFrame, prompts: Sequence[str],
                   max_seq_len: int = 512,
                   extra_cols: Sequence[str] = ()) -> DataFrame:
    """documents-with-spans -> D3 chunked records with routed gold spans.

    ``extra_cols`` are document-level columns carried through unchanged
    (e.g. a `split` assigned at doc granularity BEFORE chunk fan-out, so
    all records of one document land in the same split — the reference's
    do_split ordering, run_convert.py:100-127)."""
    from .expansion import expand_prompts

    prompted = expand_prompts(docs, prompts, spans_col="spans")
    chunked = explode_chunks(
        prompted, "text", "prompt", F.col("result_list"), max_seq_len
    )
    return chunked.select(
        "doc_id", "chunk_idx", "chunk_start", "content", "prompt", "result_list",
        *extra_cols,
    )


def to_labelstudio(extractions: DataFrame) -> DataFrame:
    """R5 — exploded extraction spans -> Label Studio import records
    (inverse of parse_labelstudio; reference
    tools/convert_to_labelstudio.py:93-143). One JSON-able row per doc:
    {id, data:{text}, annotations:[{result:[{type:'labels', value}]}]}.
    """
    ann = F.struct(
        F.lit("labels").alias("type"),
        F.struct(
            F.col("start").alias("start"),
            F.col("end").alias("end"),
            F.col("span_text").alias("text"),
            F.array(F.col("prompt")).alias("labels"),
        ).alias("value"),
    )
    text_col = (
        F.col("text") if "text" in extractions.columns
        else F.lit(None).cast("string")
    )
    per_doc = extractions.withColumn("_doc_text", text_col).groupBy("doc_id").agg(
        F.first("_doc_text", ignorenulls=True).alias("_text"),
        F.array_sort(F.collect_list(ann)).alias("_results"),
    )
    return per_doc.select(
        F.col("doc_id").alias("id"),
        F.struct(F.col("_text").alias("text")).alias("data"),
        F.array(F.struct(F.col("_results").alias("result"))).alias("annotations"),
    )


def shuffle_rows(df: DataFrame, seed: int = 1000) -> DataFrame:
    """T3 — seeded permutation (reference utils/json_utils.py:24-28).
    Deterministic for a fixed partitioning; pin shuffle partitions in
    tests (SURVEY.md §4 'seeded determinism')."""
    from pyspark.sql.functions import rand

    return df.orderBy(rand(seed))


def split_hash(
    df: DataFrame,
    ratios: Sequence[float] = (0.8, 0.1, 0.1),
    seed: int = 1000,
    cols: Sequence[str] = ("doc_id",),
    n_buckets: int = 1000,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Scale path: shuffle-free deterministic split. Each row lands in a
    bucket by a stable hash of its key columns; cumulative-ratio
    cutpoints over the buckets yield splits that are equal to the exact
    split in expectation — with NO global sort and NO single-reducer
    row_number (split_dataset funnels every row through one task for
    the exact count; at 10⁹ rows that's a scale-killer, so this is the
    default for large data). Same 80/10/10 cut-point arithmetic as
    reference run_convert.py:29-44, applied to buckets instead of rows.

    ``hasher``: 'xxhash64' (cheapest, JVM-native) or 'md5' (byte-portable
    to other engines — the driver's DuckDB oracle reproduces it).
    """
    assert abs(sum(ratios) - 1.0) < 1e-9, "ratios must sum to 1"
    if hasher == "xxhash64":
        bucket = F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(seed)),
                        F.lit(n_buckets))
    elif hasher == "md5":
        from ..functions.hashing import md5_long

        bucket = (
            md5_long(F.concat_ws("#", *[F.col(c) for c in cols], F.lit(seed)))
            % n_buckets
        )
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    cut1 = round(ratios[0] * n_buckets)
    cut2 = round((ratios[0] + ratios[1]) * n_buckets)
    split = (
        F.when(bucket < cut1, "train")
        .when(bucket < cut2, "dev")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def split_dataset(
    df: DataFrame,
    ratios: Sequence[float] = (0.8, 0.1, 0.1),
    seed: int = 1000,
    order_cols: Sequence[str] = ("doc_id", "prompt", "chunk_idx"),
) -> DataFrame:
    """Deterministic exact-count split: shuffle by seeded hash, cut at
    round(n * cumulative_ratio) (reference run_convert.py:29-44
    arithmetic). Adds a `split` column in {train, dev, test}.

    The global row_number funnels all rows through one reducer — use
    only for small curated sets; ``split_hash`` is the scale path."""
    assert abs(sum(ratios) - 1.0) < 1e-9, "ratios must sum to 1"
    h = F.xxhash64(*[F.col(c) for c in order_cols], F.lit(seed))
    w = Window.orderBy(h, *order_cols)
    n = Window.partitionBy()
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(n)
    )
    cut1 = F.round(F.col("_n") * ratios[0])
    cut2 = F.round(F.col("_n") * (ratios[0] + ratios[1]))
    return ranked.withColumn(
        "split",
        F.when(F.col("_rn") <= cut1, "train")
        .when(F.col("_rn") <= cut2, "dev")
        .otherwise("test"),
    ).drop("_rn", "_n")


def pack_documents(
    docs: DataFrame,
    cap_tokens: int = 2048,
    n_buckets: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 1000,
    target_bucket_rows: int = 250_000,
) -> DataFrame:
    """Deterministic sequence packing for pretraining prep: assign each
    document to a fixed-token-budget pack.

    -> (doc_id, n_tokens, bucket, pack_id) with pack_id =
    '<bucket>#<floor(prefix_tokens / cap_tokens)>'.

    Scale shape: a global greedy first-fit needs a global sort +
    stateful scan — a scale-killer. Here documents hash into
    ``n_buckets`` independent streams (md5-portable, like split_hash)
    and packing runs as a per-bucket window cumsum, so the only
    shuffle is by bucket and each pack's overflow is bounded by one
    document (the standard approximate quota-binning trade: packs are
    ≥ cap − max_doc and ≤ cap + max_doc tokens). Deterministic on any
    cluster size; token count is the whitespace count (swap in the
    BPE-ish proxy from textstats for byte-budget packing).

    ``n_buckets`` is the parallelism/sort trade: each bucket's window
    cumsum SORTS that bucket on ONE reducer, so buckets must stay
    reducer-sized — but more buckets means more (tiny) partial packs at
    the bucket tails. Default (None) derives it from the input:
    ``ceil(count / target_bucket_rows)`` (one cheap columnar count), so
    a 10^11-row corpus gets ~400k buckets instead of 64 giant
    single-reducer sorts while a sandbox-sized input packs in a handful.
    Pass an explicit ``n_buckets`` to pin the layout (and skip the
    count) when reproducing a published packing.
    """
    import math

    from pyspark.sql.window import Window

    from ..operators.textstats import token_count

    if n_buckets is None:
        n_buckets = max(1, math.ceil(docs.count() / target_bucket_rows))

    from ..functions.hashing import md5_long

    bucket = (
        md5_long(F.concat(F.lit(f"pack#{seed}#"), F.col(id_col).cast("string")))
        % n_buckets
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        bucket.cast("int").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.withColumn(
        "pack_id",
        F.concat_ws(
            "#", "bucket", F.floor(prefix / F.lit(float(cap_tokens))).cast("long")
        ),
    )


def sample_stratified(
    df: DataFrame,
    fractions: dict,
    strata_col: str = "lang",
    key_cols: Sequence[str] = ("doc_id",),
    seed: int = 1000,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling for corpus curation: keep each
    row with its stratum's fraction, decided by an md5 hash of the key
    columns — NOT ``sampleBy`` (whose per-row randomness depends on
    partition layout, so the sample changes with cluster size; this one
    is bit-stable anywhere and DuckDB-oracle-checkable, like
    ``split_hash``).

    ``fractions``: stratum value -> keep fraction in [0, 1]; strata not
    listed keep ``default_fraction``. Decision: row survives iff
    md5('strat#<seed>#'||key) mod 1e6 < round(fraction·1e6) — so
    per-stratum keep rates converge to the requested fractions with hash
    precision 1e-6. The cutoff is computed as a Python integer
    (``int(round(f * 1e6))``) and compared as a long LITERAL: a runtime
    ``(f * 1e6).cast('long')`` would truncate in Spark but round in a
    SQL engine's CAST for fractions whose ·1e6 isn't exactly
    representable (0.29 -> 289999.999…), silently breaking bit-parity at
    the hash boundary.
    """
    for v in fractions.values():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction {v} outside [0, 1]")
    from ..functions.hashing import md5_long

    h = (
        md5_long(
            F.concat_ws("#", F.lit(f"strat#{seed}"), *[F.col(c) for c in key_cols])
        )
        % 1000000
    )
    cutoff = F.lit(int(round(default_fraction * 1000000)))
    for stratum, f in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(f * 1000000)))
        ).otherwise(cutoff)
    return df.filter(h < cutoff)
