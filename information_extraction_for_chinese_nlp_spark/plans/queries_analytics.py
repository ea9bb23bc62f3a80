"""Analytics suite over the star schema + event stream: sessionization,
TPC-H-style join/agg plans (broadcast dims, top-k), anti-join dedup
keep-list, salted-aggregation parity, and quarantine routing — all
DuckDB-oracled."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import load, register, register_extra

# ---------------------------------------------------------------------------
# Sessionization: event-time session windows by 30-min inactivity gap —
# the batch analog of streaming session windows; lag + cumulative sum.
# ---------------------------------------------------------------------------


@register(
    "sessionize",
    """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps arrive as TIMESTAMP_NTZ; session tz is pinned
    # UTC so the cast is exact
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    sessions = events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# TPC-H-style Q1: pricing summary (scan + filter pushdown + wide agg).
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Top-k customers by revenue: broadcast dim join + agg + deterministic rank.
# ---------------------------------------------------------------------------


@register_extra(
    "top_customers",
    """
    WITH rev AS (
      SELECT c.c_custkey, c.c_name, round(sum(o.o_totalprice), 2) AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_name
    )
    SELECT c_custkey, c_name, revenue,
           row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rank
    FROM rev
    QUALIFY rank <= 10
    """,
)
def top_customers(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    rev = (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# Region revenue: chained broadcast joins through the dim hierarchy.
# ---------------------------------------------------------------------------


@register(
    "region_revenue",
    """
    SELECT r.r_name AS region, round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def region_revenue(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = F.broadcast(load(spark, sf_dir, "customer"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup keep-list via LEFT ANTI join (drop every non-canonical duplicate).
# ---------------------------------------------------------------------------


@register_extra(
    "dedup_keep",
    """
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    JOIN (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)) k
      ON d.doc_id = k.keep_id
    """,
)
def dedup_keep(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    # NULL-safe sentinel: the oracle's GROUP BY collapses md5(NULL) rows
    # into ONE group with one keeper, but an equi-join on a NULL hash
    # matches nothing, so raw md5 would keep every NULL-text doc
    h = F.coalesce(F.md5("text"), F.lit("<null>"))
    dups = (
        docs.groupBy(h.alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select("h", "keep_id")
    )
    # drop rows whose text hash is duplicated AND which are not the keeper
    with_h = docs.withColumn("h", h)
    losers = with_h.join(F.broadcast(dups), on="h").filter(
        F.col("doc_id") != F.col("keep_id")
    ).select("doc_id")
    kept = with_h.join(losers, on="doc_id", how="left_anti")
    return kept.select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Salted two-level aggregation == plain aggregation (skew-handling parity,
# proven against an independent engine's plain GROUP BY).
# ---------------------------------------------------------------------------


@register(
    "salted_assembly_parity",
    """
    SELECT user_id,
           string_agg(event_type, '' ORDER BY ts, event_id) AS doc,
           count(*) AS n_turns
    FROM events
    GROUP BY user_id
    """,
)
def salted_assembly_parity(spark, sf_dir):
    from ..operators.assembly import assemble_turns_salted

    events = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("turn_idx"),
        F.col("event_type").alias("text"),
        F.col("ts"),
    )
    out = assemble_turns_salted(events, n_salts=4)
    return out.select(
        F.col("doc_id").cast("long").alias("user_id"),
        F.col("text").alias("doc"),
        F.col("n_turns").alias("n_turns"),
    )


# ---------------------------------------------------------------------------
# P6 quarantine routing: invalid gold spans (start > end / overlong) are
# detected by the chunk UDF and routed, matching a pure-SQL validity oracle.
# ---------------------------------------------------------------------------

_QUARANTINE_ROWS = [
    (0, "x" * 80, 2, 6),     # valid
    (1, "y" * 80, 19, 13),   # start > end (reference error fixture)
    (2, "z" * 80, 0, 70),    # longer than the 61-char window
    (3, "w" * 80, 75, 79),   # valid, in a later chunk
]


def _quarantine_values() -> str:
    rows = ", ".join(f"({i}, '{t}', {s}, {e})" for i, t, s, e in _QUARANTINE_ROWS)
    return f"(VALUES {rows}) AS q(vid, text, start_, end_)"


@register(
    "chunk_quarantine",
    f"""
    SELECT vid,
           CASE WHEN start_ > end_ OR end_ - start_ > 61
                THEN 'quarantined' ELSE 'ok' END AS status
    FROM {_quarantine_values()}
    """,
)
def chunk_quarantine(spark, sf_dir):
    from ..functions.chunking import make_chunk_udf

    df = spark.createDataFrame(
        _QUARANTINE_ROWS, "vid long, text string, start_ int, end_ int"
    )
    spans = F.array(
        F.struct(
            F.col("start_").alias("start"),
            F.col("end_").alias("end"),
            F.expr("substring(text, start_ + 1, end_ - start_)").alias("text"),
        )
    )
    udf = make_chunk_udf(max_seq_len=64)  # prompt len 0 -> window 61
    chunked = df.withColumn("_chunks", udf(F.col("text"), F.lit(""), spans))
    return chunked.select(
        "vid",
        F.when(F.col("_chunks").isNull(), "quarantined").otherwise("ok").alias(
            "status"
        ),
    )


# ---------------------------------------------------------------------------
# Triple-level knowledge fusion (noisy-or): one edge per fact with
# evidence-combined confidence + provenance aggregates. Fixture derives
# deterministic (subj, pred, obj, prob) assertions from the events
# table (identically on both sides), so the oracle checks the FUSION
# math, not the extraction stub. prob = value/19 (NOT a power-of-10
# divisor): 2-dp values over a terminating divisor make the noisy-or
# product land EXACTLY on 6-dp round-half boundaries, where JVM-vs-
# DuckDB last-ulp noise flips the rounded digit (measured: 3/2500
# groups at /20). Extra tier: the primary window is at
# the driver's 50-gate cap — rotation candidate for round 8.
# ---------------------------------------------------------------------------


@register_extra(
    "triple_fusion",
    """
    WITH triples AS (
      SELECT user_id AS subj, event_type AS pred,
             CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS obj,
             least(0.95, value / 19.0) AS prob,
             event_id AS doc_id
      FROM events
    )
    SELECT subj, pred, obj,
           round(greatest(1 - exp(sum(ln(greatest(1e-12, 1 - prob)))),
                          max(prob)), 6) AS fused_prob,
           count(*) AS n_mentions,
           count(DISTINCT doc_id) AS n_docs,
           round(max(prob), 6) AS max_prob,
           min(doc_id) AS first_doc
    FROM triples
    WHERE prob IS NOT NULL
    GROUP BY subj, pred, obj
    """,
)
def triple_fusion(spark, sf_dir):
    from ..operators.fusion import fuse_triples

    ev = load(spark, sf_dir, "events")
    triples = ev.select(
        F.col("user_id").alias("subj"),
        F.col("event_type").alias("pred"),
        (F.regexp_extract("props", '"k": (\\d+)', 1).cast("long") % 10).alias(
            "obj"
        ),
        F.least(F.lit(0.95), F.col("value") / 19.0).alias("prob"),
        F.col("event_id").alias("doc_id"),
    )
    fused = fuse_triples(triples)
    return fused.select(
        "subj", "pred", "obj",
        F.round("fused_prob", 6).alias("fused_prob"),
        "n_mentions", "n_docs",
        F.round("max_prob", 6).alias("max_prob"),
        "first_doc",
    )


# The shared fixture for the fusion-family gates: deterministic
# (subj, pred, obj, prob[, ts]) assertions derived from events (see the
# triple_fusion note on the /19 divisor).
_FUSION_FIXTURE_SQL = """
    triples AS (
      SELECT user_id AS subj, event_type AS pred,
             CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS obj,
             least(0.95, value / 19.0) AS prob,
             event_id AS doc_id, ts
      FROM events
    ),
    fused AS (
      SELECT subj, pred, obj,
             round(greatest(1 - exp(sum(ln(greatest(1e-12, 1 - prob)))),
                            max(prob)), 6) AS fused_prob,
             count(*) AS n_mentions,
             count(DISTINCT doc_id) AS n_docs
      FROM triples
      WHERE prob IS NOT NULL
      GROUP BY subj, pred, obj
    )
"""


def _fusion_fixture(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("subj"),
        F.col("event_type").alias("pred"),
        (F.regexp_extract("props", '"k": (\\d+)', 1).cast("long") % 10).alias(
            "obj"
        ),
        F.least(F.lit(0.95), F.col("value") / 19.0).alias("prob"),
        F.col("event_id").alias("doc_id"),
        "ts",
    )


@register_extra(
    "functional_resolution",
    f"""
    WITH {_FUSION_FIXTURE_SQL},
    ranked AS (
      SELECT subj, pred, obj, fused_prob, n_docs, n_mentions,
             row_number() OVER w AS rn,
             lead(fused_prob) OVER w AS next_prob,
             count(*) OVER (PARTITION BY subj, pred) AS n_candidates
      FROM fused
      WINDOW w AS (PARTITION BY subj, pred
                   ORDER BY fused_prob DESC, n_docs DESC,
                            n_mentions DESC, obj ASC)
    )
    SELECT subj, pred, obj, fused_prob, n_docs, n_mentions, n_candidates,
           round(fused_prob - next_prob, 6) AS margin
    FROM ranked WHERE rn = 1
    """,
)
def functional_resolution(spark, sf_dir):
    """Functional-predicate conflict resolution over the fused graph:
    one object per (subj, pred) by (confidence, source support, mention
    support, value) with candidate-count and runner-up-margin
    diagnostics. fused_prob is pre-rounded to the gate's 6dp BEFORE
    ranking so the Spark and DuckDB windows order on identical values
    (last-ulp noise in the unrounded noisy-or could otherwise flip a
    near-tie's winner between engines). Extra tier: the primary window
    is at the driver's 50-gate cap — rotation candidate for round 8."""
    from ..operators.fusion import fuse_triples, resolve_functional

    fused = fuse_triples(_fusion_fixture(spark, sf_dir)).withColumn(
        "fused_prob", F.round("fused_prob", 6)
    )
    resolved = resolve_functional(fused)
    return resolved.select(
        "subj", "pred", "obj", "fused_prob", "n_docs", "n_mentions",
        "n_candidates",
        F.round("margin", 6).alias("margin"),
    )


@register_extra(
    "fact_intervals",
    """
    WITH triples AS (
      SELECT user_id AS subj, event_type AS pred,
             CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS obj,
             least(0.95, value / 19.0) AS prob,
             event_id AS doc_id, ts
      FROM events
    )
    SELECT subj, pred, obj,
           round(greatest(1 - exp(sum(ln(greatest(1e-12, 1 - prob)))),
                          max(prob)), 6) AS fused_prob,
           count(*) AS n_mentions,
           min(ts) AS first_seen,
           max(ts) AS last_seen
    FROM triples
    WHERE prob IS NOT NULL
    GROUP BY subj, pred, obj
    """,
)
def fact_intervals(spark, sf_dir):
    """Temporal scoping of fused facts: min/max mention timestamp per
    (subj, pred, obj) — the fact's observed validity envelope — riding
    the same single fusion shuffle (``fuse_triples(ts_col=...)``).
    Extra tier: rotation candidate for round 8."""
    from ..operators.fusion import fuse_triples

    fused = fuse_triples(_fusion_fixture(spark, sf_dir), ts_col="ts")
    return fused.select(
        "subj", "pred", "obj",
        F.round("fused_prob", 6).alias("fused_prob"),
        "n_mentions", "first_seen", "last_seen",
    )


@register_extra(
    "entity_salience",
    f"""
    WITH {_FUSION_FIXTURE_SQL}
    SELECT obj,
           count(*) AS n_facts,
           count(DISTINCT subj) AS n_subjects,
           count(DISTINCT pred) AS n_preds,
           round(sum(fused_prob), 6) AS support,
           CAST(sum(n_mentions) AS BIGINT) AS total_mentions
    FROM fused
    GROUP BY obj
    """,
)
def entity_salience_gate(spark, sf_dir):
    """Per-entity weighted degree over the fused graph (fact count,
    distinct neighbors/relations, summed confidence) — ranks entities
    for curation budget. Sums the 6dp-rounded per-fact scores so the
    float accumulation is over identical operands on both engines.
    Extra tier: rotation candidate for round 8."""
    from ..operators.fusion import entity_salience, fuse_triples

    fused = fuse_triples(_fusion_fixture(spark, sf_dir)).withColumn(
        "fused_prob", F.round("fused_prob", 6)
    )
    sal = entity_salience(fused)
    return sal.select(
        "obj", "n_facts", "n_subjects", "n_preds",
        F.round("support", 6).alias("support"),
        "total_mentions",
    )


# constraint fixture for fact_validation: covers every status branch —
# 'purchase' is deliberately ABSENT (unknown_pred), 'error' constrains
# the object pattern, 'signup' the confidence floor, 'click' the
# support floor, 'view' is unconstrained-but-known (all ok)
_CONSTRAINT_ROWS = [
    ("click", None, None, 3),
    ("error", "[0-4]", None, None),
    ("signup", None, 0.9999, None),
    ("view", None, None, None),
]


@register_extra(
    "fact_validation",
    f"""
    WITH {_FUSION_FIXTURE_SQL},
    constraints AS (
      SELECT * FROM (VALUES
        ('click', NULL, NULL, 3),
        ('error', '[0-4]', NULL, NULL),
        ('signup', NULL, 0.9999, NULL),
        ('view', NULL, NULL, NULL)
      ) AS c(pred, obj_pattern, min_prob, min_docs)
    )
    SELECT f.subj, f.pred, f.obj, f.fused_prob, f.n_docs,
           CASE
             WHEN c.pred IS NULL THEN 'unknown_pred'
             WHEN c.obj_pattern IS NOT NULL
                  AND NOT coalesce(regexp_full_match(CAST(f.obj AS VARCHAR),
                                                     c.obj_pattern), FALSE)
               THEN 'bad_object'
             WHEN c.min_prob IS NOT NULL AND f.fused_prob < c.min_prob
               THEN 'low_conf'
             WHEN c.min_docs IS NOT NULL AND f.n_docs < c.min_docs
               THEN 'low_support'
             ELSE 'ok'
           END AS status
    FROM fused f LEFT JOIN constraints c ON c.pred = f.pred
    """,
)
def fact_validation(spark, sf_dir):
    """Ontology-constraint validation over the fused graph
    (``operators.fusion.validate_facts``): per-predicate object-pattern
    and support-floor checks, first failure names the status,
    broadcast-joined on the ontology-sized constraint table. Extra
    tier: rotation candidate for round 8."""
    from ..operators.fusion import fuse_triples, validate_facts

    fused = fuse_triples(_fusion_fixture(spark, sf_dir)).withColumn(
        "fused_prob", F.round("fused_prob", 6)
    )
    constraints = spark.createDataFrame(
        _CONSTRAINT_ROWS,
        "pred string, obj_pattern string, min_prob double, min_docs int",
    )
    out = validate_facts(fused, constraints)
    return out.select("subj", "pred", "obj", "fused_prob", "n_docs", "status")


@register_extra(
    "kg_snapshot_diff",
    """
    WITH triples AS (
      SELECT user_id AS subj, event_type AS pred,
             CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS obj,
             least(0.95, value / 19.0) AS prob,
             event_id AS doc_id
      FROM events
    ),
    old_f AS (
      SELECT subj, pred, obj,
             round(greatest(1 - exp(sum(ln(greatest(1e-12, 1 - prob)))),
                            max(prob)), 6) AS fused_prob
      FROM triples WHERE prob IS NOT NULL AND doc_id % 2 = 0
      GROUP BY subj, pred, obj
    ),
    new_f AS (
      SELECT subj, pred, obj,
             round(greatest(1 - exp(sum(ln(greatest(1e-12, 1 - prob)))),
                            max(prob)), 6) AS fused_prob
      FROM triples WHERE prob IS NOT NULL AND doc_id % 3 != 0
      GROUP BY subj, pred, obj
    )
    SELECT coalesce(o.subj, n.subj) AS subj,
           coalesce(o.pred, n.pred) AS pred,
           coalesce(o.obj, n.obj) AS obj,
           CASE WHEN o.subj IS NULL THEN 'added'
                WHEN n.subj IS NULL THEN 'removed'
                WHEN abs(n.fused_prob - o.fused_prob) > 0 THEN 'changed'
           END AS change,
           o.fused_prob AS old_prob,
           n.fused_prob AS new_prob
    FROM old_f o FULL OUTER JOIN new_f n
      ON o.subj = n.subj AND o.pred = n.pred AND o.obj = n.obj
    WHERE (CASE WHEN o.subj IS NULL THEN 'added'
                WHEN n.subj IS NULL THEN 'removed'
                WHEN abs(n.fused_prob - o.fused_prob) > 0 THEN 'changed'
           END) IS NOT NULL
    """,
)
def kg_snapshot_diff(spark, sf_dir):
    """Delta between two fused snapshots (``operators.fusion.kg_diff``):
    overlapping-but-neither-subset event slices exercise added, removed,
    AND changed classifications; scores pre-rounded to the gate's 6dp
    so both engines diff identical operands. Extra tier: rotation
    candidate for round 8."""
    from ..operators.fusion import fuse_triples, kg_diff

    t = _fusion_fixture(spark, sf_dir)
    old = fuse_triples(t.filter(F.col("doc_id") % 2 == 0)).withColumn(
        "fused_prob", F.round("fused_prob", 6)
    )
    new = fuse_triples(t.filter(F.col("doc_id") % 3 != 0)).withColumn(
        "fused_prob", F.round("fused_prob", 6)
    )
    return kg_diff(old, new)


def _pagerank_sql(iters: int = 3, d: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank as plain SQL (one CTE pair per
    iteration — DuckDB needs no recursion, and the unrolled form is
    exactly the operator's update rule). The gate graph is the
    BIDIRECTIONAL subject<->entity graph (prefixed node ids keep the
    two id spaces disjoint), so no node dangles here; the dangling-
    redistribution branch is pinned by test_centrality's NumPy parity
    instead."""
    head = """
    triples AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS subj,
             'o' || CAST(CAST(regexp_extract(props, '"k": (\\d+)', 1)
                              AS BIGINT) % 10 AS VARCHAR) AS obj
      FROM events
    ),
    edges AS (
      SELECT subj AS src, obj AS dst FROM triples
      UNION
      SELECT obj AS src, subj AS dst FROM triples
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)
    """
    its = []
    for i in range(1, iters + 1):
        its.append(f"""
    c{i} AS (
      SELECT e.dst AS node, sum(r.rank / deg.deg) AS c
      FROM r{i - 1} r
      JOIN edges e ON e.src = r.node
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.node,
             (1 - {d}) / (SELECT n FROM nn)
             + {d} * coalesce(c.c, 0) AS rank
      FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
    )""")
    return (
        "WITH "
        + head
        + ","
        + ",".join(its)
        + f"""
    SELECT node, round(rank, 6) AS rank FROM r{iters}
    """
    )


@register_extra("pagerank_entities", _pagerank_sql())
def pagerank_entities(spark, sf_dir):
    """Global entity importance over the bidirectional subject<->entity
    graph via ``operators.centrality.pagerank`` (fixed 3 iterations for
    oracle determinism; every node has out-edges here, so both engines
    run the pure propagation rule). Extra tier: rotation candidate for
    round 8."""
    from ..operators.centrality import pagerank

    t = _fusion_fixture(spark, sf_dir).select(
        F.concat(F.lit("u"), F.col("subj").cast("string")).alias("subj"),
        F.concat(F.lit("o"), F.col("obj").cast("string")).alias("obj"),
    )
    edges = t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")).unionByName(
        t.select(F.col("obj").alias("src"), F.col("subj").alias("dst"))
    ).distinct()
    ranks = pagerank(edges, max_iter=3)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def _lpa_sql(iters: int = 3) -> str:
    """Synchronous min-tie label-propagation oracle, unrolled: each
    round every node takes the most frequent neighbor label, ties to
    the smallest. The graph is the already-bidirectional subject<->
    entity edge set (each neighbor votes once; the operator is called
    with directed=True on the same frame so the votes match exactly)."""
    head = """
    triples AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS subj,
             'o' || CAST(CAST(regexp_extract(props, '"k": (\\d+)', 1)
                              AS BIGINT) % 10 AS VARCHAR) AS obj
      FROM events
    ),
    edges AS (
      SELECT subj AS src, obj AS dst FROM triples
      UNION
      SELECT obj AS src, subj AS dst FROM triples
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    l0 AS (SELECT node, node AS label FROM nodes)
    """
    its = []
    for i in range(1, iters + 1):
        its.append(f"""
    c{i} AS (
      SELECT e.dst AS node, l.label, count(*) AS n
      FROM l{i - 1} l JOIN edges e ON e.src = l.node
      GROUP BY e.dst, l.label
    ),
    l{i} AS (
      SELECT node, label FROM c{i}
      QUALIFY row_number() OVER (
        PARTITION BY node ORDER BY n DESC, label ASC) = 1
    )""")
    return (
        "WITH " + head + "," + ",".join(its)
        + f"""
    SELECT node, label FROM l{iters}
    """
    )


@register_extra("label_propagation_communities", _lpa_sql())
def label_propagation_communities(spark, sf_dir):
    """Deterministic synchronous LPA communities over the bidirectional
    subject<->entity graph (``operators.centrality.label_propagation``
    vs an unrolled per-round SQL). Extra tier: rotation candidate for
    round 8."""
    from ..operators.centrality import label_propagation

    t = _fusion_fixture(spark, sf_dir).select(
        F.concat(F.lit("u"), F.col("subj").cast("string")).alias("subj"),
        F.concat(F.lit("o"), F.col("obj").cast("string")).alias("obj"),
    )
    edges = t.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    ).unionByName(
        t.select(F.col("obj").alias("src"), F.col("subj").alias("dst"))
    ).distinct()
    return label_propagation(edges, max_iter=3, directed=True)


def _ppr_sql(iters: int = 3, d: float = 0.85) -> str:
    """Personalized-PageRank oracle: same unrolled update as
    ``_pagerank_sql`` but with the reset vector concentrated on the
    seed entity 'o0' (rv = 1 there, 0 elsewhere; the bidirectional
    graph has no danglers, so the dangling term is identically 0)."""
    head = """
    triples AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS subj,
             'o' || CAST(CAST(regexp_extract(props, '"k": (\\d+)', 1)
                              AS BIGINT) % 10 AS VARCHAR) AS obj
      FROM events
    ),
    edges AS (
      SELECT subj AS src, obj AS dst FROM triples
      UNION
      SELECT obj AS src, subj AS dst FROM triples
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    rv AS (
      SELECT node, CASE WHEN node = 'o0' THEN 1.0 ELSE 0.0 END AS v
      FROM nodes
    ),
    r0 AS (SELECT node, v AS rank FROM rv)
    """
    its = []
    for i in range(1, iters + 1):
        its.append(f"""
    c{i} AS (
      SELECT e.dst AS node, sum(r.rank / deg.deg) AS c
      FROM r{i - 1} r
      JOIN edges e ON e.src = r.node
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.node,
             rv.v * (1 - {d}) + {d} * coalesce(c.c, 0) AS rank
      FROM nodes n
      JOIN rv ON rv.node = n.node
      LEFT JOIN c{i} c ON c.node = n.node
    )""")
    return (
        "WITH "
        + head
        + ","
        + ",".join(its)
        + f"""
    SELECT node, round(rank, 6) AS rank FROM r{iters}
    """
    )


@register_extra("pagerank_personalized", _ppr_sql())
def pagerank_personalized(spark, sf_dir):
    """Personalized PageRank anchored on one seed entity
    (``pagerank(seeds=...)``): rank measures proximity-weighted
    importance relative to 'o0'. Extra tier: rotation candidate for
    round 8."""
    from ..operators.centrality import pagerank

    t = _fusion_fixture(spark, sf_dir).select(
        F.concat(F.lit("u"), F.col("subj").cast("string")).alias("subj"),
        F.concat(F.lit("o"), F.col("obj").cast("string")).alias("obj"),
    )
    edges = t.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    ).unionByName(
        t.select(F.col("obj").alias("src"), F.col("subj").alias("dst"))
    ).distinct()
    seeds = spark.createDataFrame([("o0",)], "node string")
    ranks = pagerank(edges, max_iter=3, seeds=seeds)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@register_extra(
    "functional_resolution_recency",
    """
    WITH triples AS (
      SELECT user_id AS subj, event_type AS pred,
             CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS obj,
             least(0.95, value / 19.0) AS prob,
             event_id AS doc_id, ts
      FROM events
    ),
    fusedt AS (
      SELECT subj, pred, obj,
             round(greatest(1 - exp(sum(ln(greatest(1e-12, 1 - prob)))),
                            max(prob)), 6) AS fused_prob,
             count(*) AS n_mentions,
             count(DISTINCT doc_id) AS n_docs,
             max(ts) AS last_seen
      FROM triples WHERE prob IS NOT NULL
      GROUP BY subj, pred, obj
    ),
    ranked AS (
      SELECT subj, pred, obj, fused_prob, n_docs, n_mentions, last_seen,
             row_number() OVER w AS rn,
             lead(fused_prob) OVER w AS next_prob,
             count(*) OVER (PARTITION BY subj, pred) AS n_candidates
      FROM fusedt
      WINDOW w AS (PARTITION BY subj, pred
                   ORDER BY last_seen DESC, fused_prob DESC, n_docs DESC,
                            n_mentions DESC, obj ASC)
    )
    SELECT subj, pred, obj, fused_prob, n_docs, n_mentions, last_seen,
           n_candidates, round(fused_prob - next_prob, 6) AS margin
    FROM ranked WHERE rn = 1
    """,
)
def functional_resolution_recency(spark, sf_dir):
    """Most-recent-assertion-wins resolution for MUTABLE functional
    predicates (``resolve_functional(strategy='recency')``): last_seen
    descending supersedes the confidence chain, which still breaks
    same-timestamp ties. Extra tier: rotation candidate for round 8."""
    from ..operators.fusion import fuse_triples, resolve_functional

    fused = fuse_triples(_fusion_fixture(spark, sf_dir), ts_col="ts").withColumn(
        "fused_prob", F.round("fused_prob", 6)
    )
    resolved = resolve_functional(fused, strategy="recency")
    return resolved.select(
        "subj", "pred", "obj", "fused_prob", "n_docs", "n_mentions",
        "last_seen", "n_candidates",
        F.round("margin", 6).alias("margin"),
    )


@register_extra(
    "k_hop_entities",
    """
    WITH triples AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS subj,
             'o' || CAST(CAST(regexp_extract(props, '"k": (\\d+)', 1)
                              AS BIGINT) % 10 AS VARCHAR) AS obj
      FROM events
    ),
    edges AS (
      SELECT subj AS src, obj AS dst FROM triples
      UNION
      SELECT obj AS src, subj AS dst FROM triples
    ),
    h0 AS (SELECT * FROM (VALUES ('o0'), ('o1')) AS s(node)),
    r1 AS (
      SELECT DISTINCT e.dst AS node FROM edges e JOIN h0 ON e.src = h0.node
    ),
    h1 AS (
      SELECT r1.node FROM r1 LEFT JOIN h0 USING (node) WHERE h0.node IS NULL
    ),
    v1 AS (SELECT node FROM h0 UNION ALL SELECT node FROM h1),
    r2 AS (
      SELECT DISTINCT e.dst AS node FROM edges e JOIN h1 ON e.src = h1.node
    ),
    h2 AS (
      SELECT r2.node FROM r2 LEFT JOIN v1 USING (node) WHERE v1.node IS NULL
    )
    SELECT node, CAST(0 AS BIGINT) AS hop FROM h0
    UNION ALL SELECT node, 1 FROM h1
    UNION ALL SELECT node, 2 FROM h2
    """,
)
def k_hop_entities(spark, sf_dir):
    """Minimal-hop 2-neighborhood of two seed entities over the
    bidirectional subject<->entity graph (``operators.traversal.k_hop``
    vs an unrolled frontier-expansion SQL). Extra tier: rotation
    candidate for round 8."""
    from ..operators.traversal import k_hop

    t = _fusion_fixture(spark, sf_dir).select(
        F.concat(F.lit("u"), F.col("subj").cast("string")).alias("subj"),
        F.concat(F.lit("o"), F.col("obj").cast("string")).alias("obj"),
    )
    edges = t.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    ).unionByName(
        t.select(F.col("obj").alias("src"), F.col("subj").alias("dst"))
    ).distinct()
    seeds = spark.createDataFrame([("o0",), ("o1",)], "node string")
    return k_hop(edges, seeds, k=2)


@register_extra(
    "fact_eval",
    f"""
    WITH {_FUSION_FIXTURE_SQL},
    pred_facts AS (
      SELECT subj, pred, obj FROM fused WHERE fused_prob >= 0.9
    ),
    gold AS (
      SELECT subj, pred, obj FROM fused WHERE n_docs >= 3
    ),
    correct AS (
      SELECT p.pred AS class, count(*) AS num_correct
      FROM pred_facts p JOIN gold g
        ON p.subj = g.subj AND p.pred = g.pred AND p.obj = g.obj
      GROUP BY p.pred
    ),
    infer AS (
      SELECT pred AS class, count(*) AS num_infer
      FROM pred_facts GROUP BY pred
    ),
    label AS (
      SELECT pred AS class, count(*) AS num_label FROM gold GROUP BY pred
    )
    SELECT coalesce(i.class, l.class) AS class,
           coalesce(c.num_correct, 0) AS num_correct,
           coalesce(i.num_infer, 0) AS num_infer,
           coalesce(l.num_label, 0) AS num_label,
           coalesce(round(c.num_correct / CAST(i.num_infer AS DOUBLE), 6),
                    0.0) AS precision_,
           coalesce(round(c.num_correct / CAST(l.num_label AS DOUBLE), 6),
                    0.0) AS recall_
    FROM infer i
    FULL OUTER JOIN label l ON l.class = i.class
    LEFT JOIN correct c ON c.class = coalesce(i.class, l.class)
    """,
)
def fact_eval(spark, sf_dir):
    """KG-level per-predicate P/R over fused FACTS (not spans): the
    generic ``operators.evaluation.eval_counts`` composed onto the
    fusion output — predictions are high-confidence facts, pseudo-gold
    the well-supported ones, so the gate exercises exact-match fact
    joins with both miss directions populated. Extra tier: rotation
    candidate for round 8."""
    from ..operators.evaluation import eval_counts
    from ..operators.fusion import fuse_triples

    fused = fuse_triples(_fusion_fixture(spark, sf_dir)).withColumn(
        "fused_prob", F.round("fused_prob", 6)
    )
    pred_facts = fused.filter(F.col("fused_prob") >= 0.9).select(
        "subj", F.col("pred").alias("class"), "obj"
    )
    gold = fused.filter(F.col("n_docs") >= 3).select(
        "subj", F.col("pred").alias("class"), "obj"
    )
    return eval_counts(
        pred_facts, gold, keys=("subj", "class", "obj"), group_col="class"
    )
