"""SQL-expressible operator analogs (SURVEY.md §2) over the driver's
testdata tables, each with a DuckDB oracle.

Naming convention: every computed column is aliased identically in the
Spark plan and the oracle SQL. Aggregated doubles are rounded to 6
decimals on both sides so the value-hash compare is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import load, register, register_extra

# ---------------------------------------------------------------------------
# Turn assembly (our D1->document step; reference reads pre-assembled docs,
# run_infer.py:123-125). Events stand in for transcripts: user_id = conv_id,
# (ts, event_id) = stable turn order, event_type = turn text.
# ---------------------------------------------------------------------------


@register(
    "turn_assembly",
    """
    SELECT user_id,
           string_agg(event_type, '' ORDER BY ts, event_id) AS doc,
           count(*) AS n_turns
    FROM events
    GROUP BY user_id
    """,
)
def turn_assembly(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    return events.groupBy("user_id").agg(
        F.array_join(F.transform(ordered, lambda s: s["event_type"]), "").alias("doc"),
        F.count("*").alias("n_turns"),
    )


# ---------------------------------------------------------------------------
# P1 — stateless scrub as a pure Catalyst expression chain
# (reference run_infer.py:52-59; token list config/base_config.py:17).
# ---------------------------------------------------------------------------


@register(
    "scrub_regexp",
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '\n', '', 'g'),
               ' ', '', 'g'),
             '　', '', 'g'),
           '\\n', '', 'g') AS clean_text
    FROM documents
    """,
)
def scrub_regexp(spark, sf_dir):
    from ..functions.text import scrub_col

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", scrub_col(F.col("text")).alias("clean_text"))


# ---------------------------------------------------------------------------
# R1 — prompt expansion cross product (reference utils/json_utils.py:49-52).
# ---------------------------------------------------------------------------


@register(
    "prompt_expand",
    """
    SELECT d.doc_id, p.prompt, length(d.text) AS n_chars
    FROM documents d
    CROSS JOIN (SELECT unnest(['精神慰撫金額', '醫療費用', '薪資收入']) AS prompt) p
    """,
)
def prompt_expand(spark, sf_dir):
    from .. import ENTITY_TYPES

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(p) for p in ENTITY_TYPES])).alias("prompt"),
        F.length("text").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# R2 — fixed-width chunk windowing (the no-gold-span case of
# utils/data_utils.py:43-87; width = max_seq_len - len(prompt) - 3).
# ---------------------------------------------------------------------------

_CHUNK_W = 64


@register(
    "chunk_bounds",
    f"""
    SELECT doc_id, chunk_idx,
           substring(text, chunk_idx * {_CHUNK_W} + 1, {_CHUNK_W}) AS content
    FROM (
      SELECT doc_id, text,
             unnest(range(0, CAST(floor((length(text) - 1) / {_CHUNK_W}) AS INT) + 1))
               AS chunk_idx
      FROM documents
      WHERE length(text) > 0
    )
    """,
)
def chunk_bounds(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    idx = F.explode(
        F.sequence(F.lit(0), F.floor((F.length("text") - 1) / _CHUNK_W).cast("int"))
    ).alias("chunk_idx")
    with_idx = docs.select("doc_id", "text", idx)
    return with_idx.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.substring(
            F.col("text"), F.col("chunk_idx") * _CHUNK_W + 1, F.lit(_CHUNK_W)
        ).alias("content"),
    )


# ---------------------------------------------------------------------------
# P4 — strict > threshold filter (reference run_infer.py:65-67).
# ---------------------------------------------------------------------------


@register(
    "threshold_filter",
    """
    SELECT event_id, round(value / 200.0, 6) AS probability
    FROM events
    WHERE value / 200.0 > 0.5
    """,
)
def threshold_filter(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    prob = F.col("value") / 200.0
    return events.filter(prob > 0.5).select(
        "event_id", F.round(prob, 6).alias("probability")
    )


# ---------------------------------------------------------------------------
# A1/T2 — top-1 per group via max_by (reference run_infer.py:61-63),
# deterministic tie-break (value desc, event_id asc).
# ---------------------------------------------------------------------------


@register_extra(
    "top1_per_group",
    """
    SELECT user_id, event_type, event_id, value
    FROM (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY value DESC, event_id
             ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def top1_per_group(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    best = F.max_by(
        F.struct("event_id", "value"), F.struct(F.col("value"), -F.col("event_id"))
    )
    return (
        events.groupBy("user_id", "event_type")
        .agg(best.alias("_b"))
        .select(
            "user_id",
            "event_type",
            F.col("_b.event_id").alias("event_id"),
            F.col("_b.value").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# A2/A3 — span-eval exact-match counts grouped by class
# (reference run_eval.py:60-114): pred ∩ gold via inner join, three counters.
# pred = events with value > 100; gold = even event_ids.
# ---------------------------------------------------------------------------


@register_extra(
    "span_eval_counts",
    """
    WITH pred AS (SELECT event_id, event_type FROM events WHERE value > 100),
         gold AS (SELECT event_id, event_type FROM events WHERE event_id % 2 = 0),
         correct AS (
           SELECT p.event_type, count(*) AS num_correct
           FROM pred p JOIN gold g USING (event_id)
           GROUP BY p.event_type
         ),
         infer AS (SELECT event_type, count(*) AS num_infer FROM pred GROUP BY event_type),
         label AS (SELECT event_type, count(*) AS num_label FROM gold GROUP BY event_type)
    SELECT event_type,
           coalesce(c.num_correct, 0) AS num_correct,
           coalesce(i.num_infer, 0) AS num_infer,
           coalesce(l.num_label, 0) AS num_label,
           CASE WHEN coalesce(i.num_infer, 0) = 0 THEN 0.0
                ELSE round(coalesce(c.num_correct, 0) / CAST(i.num_infer AS DOUBLE), 6)
           END AS precision_,
           CASE WHEN coalesce(l.num_label, 0) = 0 THEN 0.0
                ELSE round(coalesce(c.num_correct, 0) / CAST(l.num_label AS DOUBLE), 6)
           END AS recall_
    -- FULL OUTER: a class present only in pred (or only in gold) still
    -- reports a row, matching eval_counts' full-join semantics
    FROM infer i
    FULL OUTER JOIN label l USING (event_type)
    LEFT JOIN correct c USING (event_type)
    """,
)
def span_eval_counts(spark, sf_dir):
    from ..operators.evaluation import eval_counts

    events = load(spark, sf_dir, "events")
    pred = events.filter(F.col("value") > 100).select("event_id", "event_type")
    gold = events.filter(F.col("event_id") % 2 == 0).select("event_id", "event_type")
    return eval_counts(pred, gold, keys=["event_id"], group_col="event_type")


# ---------------------------------------------------------------------------
# A4 — deterministic 80/10/10 split via global row_number
# (reference run_convert.py:10-44; exact-count variant of randomSplit).
# ---------------------------------------------------------------------------


@register_extra(
    "split_counts",
    """
    WITH ranked AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn,
             count(*) OVER () AS n
      FROM documents
    )
    SELECT CASE WHEN rn <= floor(n * 0.8) THEN 'train'
                WHEN rn <= floor(n * 0.9) THEN 'dev'
                ELSE 'test' END AS split,
           count(*) AS n_docs
    FROM ranked
    GROUP BY 1
    """,
)
def split_counts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    ranked = docs.select(
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    split = (
        F.when(F.col("rn") <= F.floor(F.col("n") * 0.8), "train")
        .when(F.col("rn") <= F.floor(F.col("n") * 0.9), "dev")
        .otherwise("test")
    )
    return ranked.groupBy(split.alias("split")).agg(F.count("*").alias("n_docs"))


# ---------------------------------------------------------------------------
# A4 scale path — shuffle-free hash split (equal to the exact split in
# expectation; no single-reducer global sort). md5 hasher so DuckDB
# reproduces the bucketing bit-for-bit.
# ---------------------------------------------------------------------------


@register_extra(
    "split_hash_counts",
    """
    WITH b AS (
      SELECT ('0x' || substring(md5(concat(doc_id, '#', 1000)), 1, 8))::BIGINT % 1000
               AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 800 THEN 'train'
                WHEN bucket < 900 THEN 'dev'
                ELSE 'test' END AS split,
           count(*) AS n_docs
    FROM b
    GROUP BY 1
    """,
)
def split_hash_counts(spark, sf_dir):
    from ..operators.convert import split_hash

    docs = load(spark, sf_dir, "documents")
    out = split_hash(docs, cols=("doc_id",), seed=1000, hasher="md5")
    return out.groupBy("split").agg(F.count("*").alias("n_docs"))


# ---------------------------------------------------------------------------
# T1 — stable sort rank (reference utils/json_utils.py:120-122).
# ---------------------------------------------------------------------------


@register(
    "sort_rank",
    """
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn_rank
    FROM events
    """,
)
def sort_rank(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("long").alias("turn_rank"),
    )


# ---------------------------------------------------------------------------
# T4 — distinctness (reference run_eval.py:32,71).
# ---------------------------------------------------------------------------


@register(
    "distinct_types",
    """
    SELECT user_id, count(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
)
def distinct_types(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types")
    )


# ---------------------------------------------------------------------------
# A5 — error-rate aggregate (reference
# tools/regularize_money_from_csv_results.py:150-152).
# ---------------------------------------------------------------------------


@register(
    "error_rate",
    """
    SELECT round(avg(CASE WHEN value < 50 THEN 1.0 ELSE 0.0 END), 6) AS err_rate,
           count(*) AS n
    FROM events
    """,
)
def error_rate(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    return events.agg(
        F.round(F.avg(F.when(F.col("value") < 50, 1.0).otherwise(0.0)), 6).alias(
            "err_rate"
        ),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# JSON scalar extraction over the events.props column.
# ---------------------------------------------------------------------------


@register(
    "props_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE props IS NOT NULL
    """,
)
def props_extract(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    return events.filter(F.col("props").isNotNull()).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


# ---------------------------------------------------------------------------
# Streaming analog in batch — tumbling 1h event-time window aggregation.
# ---------------------------------------------------------------------------


@register(
    "events_hourly",
    """
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
