"""Deterministic synthetic transcripts per BASELINE.json input_hint.

Schema: (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp).

Generation is fully distributed — ``spark.range`` plus Catalyst
expressions only (xxhash64-seeded picks from literal arrays), so the same
generator that makes 1k turns for a unit test would make 10^12 turns on a
cluster with no driver-side data and no wall-clock reads. Text embeds the
reference's scrub targets (newline, space, U+3000, literal ``\\n``) and
money mentions for all three entity types (reference fixture style:
tests/conftest.py:4-8), so the span/normalization paths are exercised
like the verdict corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import ENTITY_TYPES

_FILLER = [
    "原告主張被告應負損害賠償責任",
    "被告抗辯其並無過失",
    "經查本件事故發生於上開時地",
    "兩造對於事實均不爭執",
    "依民法第184條第1項前段規定",
    "審酌原告所受傷勢非輕",
    "查 閱卷內病歷資料",
    "次按\\n慰撫金之賠償",
    "證人於審理中證述明確",
    "爰審酌兩造身分地位經濟能力",
]

_MONEY = [
    "98,532元",
    "1,680元",
    "八萬元",
    "三千500元",
    "一萬五千元",
    "六百二十五元",
    "2,954元",
    "五萬三千元",
    "10000元",
    "七百元",
]

_ROLES = ["user", "assistant", "tool"]


def _pick(arr_col, hash_col):
    return F.element_at(arr_col, (F.pmod(hash_col, F.size(arr_col)) + 1).cast("int"))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    turns_per_conv: int = 12,
    seed: int = 42,
    long_conv_every: int = 50,
    long_conv_turns: int = 400,
) -> DataFrame:
    """Distributed deterministic transcripts.

    Every ``long_conv_every``-th conversation gets ``long_conv_turns``
    turns instead — the pathological skew case (FIXTURES.md F1).
    """
    convs = spark.range(n_convs).select(
        F.col("id").alias("conv_n"),
        F.when(F.col("id") % long_conv_every == 0, F.lit(long_conv_turns))
        .otherwise(F.lit(turns_per_conv))
        .alias("n_turns"),
    )
    turns = convs.select(
        "conv_n",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    h = F.xxhash64("conv_n", "turn_idx", F.lit(seed))
    h2 = F.xxhash64("conv_n", "turn_idx", F.lit(seed + 1))
    h3 = F.xxhash64("conv_n", "turn_idx", F.lit(seed + 2))

    filler = F.array(*[F.lit(s) for s in _FILLER])
    money = F.array(*[F.lit(s) for s in _MONEY])
    entity = F.array(*[F.lit(s) for s in ENTITY_TYPES])
    roles = F.array(*[F.lit(s) for s in _ROLES])

    # ~1 turn in 3 carries an entity mention: "<entity><money>".
    mention = F.when(
        F.pmod(h, 3) == 0,
        F.concat(_pick(entity, h2), _pick(money, h3)),
    ).otherwise(F.lit(""))

    text = F.concat(
        _pick(filler, h),
        F.lit("\n"),
        mention,
        F.lit(" "),
        _pick(filler, h2),
        F.lit("　"),
    )

    # _pick pmods its hash, so abs() adds nothing and would ANSI-throw on
    # Long.MIN_VALUE
    role = _pick(roles, h2)
    return turns.select(
        # 13-digit pad: Spark lpad TRUNCATES longer strings, so an
        # 8-wide pad silently collides conv ids past 10^8 conversations
        # — this generator is documented to reach ~10^11 on a cluster
        F.concat(F.lit("conv-"), F.lpad(F.col("conv_n").cast("string"), 13, "0")).alias(
            "conv_id"
        ),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", F.concat(F.lit("tool_"), F.pmod(h3, 5).cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        (
            F.to_timestamp(F.lit("2025-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("conv_n") * 3600 + F.col("turn_idx") * 7).cast("double"))
        ).alias("ts"),
    )


def _md5_pick_hash(tag: str, col):
    """Portable pick hash: first 8 hex digits of md5('<tag>#<key>') as a
    long — byte-identical in DuckDB (('0x'||substring(md5(...),1,8))::BIGINT),
    so pipelines seeded by it are oracle-checkable end-to-end (xxhash64
    is Spark-specific and would break the driver's DuckDB gate)."""
    from ..functions.hashing import md5_long

    return md5_long(F.concat(F.lit(tag + "#"), col.cast("string")))


def transcripts_from_documents(documents: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministically reshape the driver's documents.parquet into the
    transcripts schema: each document becomes a 3-turn conversation, with
    one money mention injected per document (derived from doc_id) so the
    extraction path has hits. Used by the flagship ``entry``.

    Every derived value is md5-based (see ``_md5_pick_hash``) so the
    whole downstream triple pipeline has a DuckDB oracle
    (``triples_pipeline`` gate entry).
    """
    third = (F.length("text") / 3).cast("int")
    money = F.array(*[F.lit(s) for s in _MONEY])
    entity = F.array(*[F.lit(s) for s in ENTITY_TYPES])
    mention = F.concat(
        _pick(entity, _md5_pick_hash(f"ent#{seed}", F.col("doc_id"))),
        _pick(money, _md5_pick_hash(f"money#{seed + 1}", F.col("doc_id"))),
    )

    base = documents.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("conv_id"),
        "text",
        third.alias("third"),
        mention.alias("mention"),
    )
    turns = base.select(
        "conv_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("turn_idx"),
                    F.lit("user").alias("role"),
                    F.substring(F.col("text"), 1, F.col("third")).alias("text"),
                ),
                F.struct(
                    F.lit(1).alias("turn_idx"),
                    F.lit("assistant").alias("role"),
                    F.concat(
                        F.col("mention"),
                        F.substring(F.col("text"), F.col("third") + 1, F.col("third")),
                    ).alias("text"),
                ),
                F.struct(
                    F.lit(2).alias("turn_idx"),
                    F.lit("tool").alias("role"),
                    F.substring(
                        F.col("text"), F.col("third") * 2 + 1, F.length("text")
                    ).alias("text"),
                ),
            )
        ).alias("t"),
    )
    return turns.select(
        "conv_id",
        F.col("t.turn_idx").cast("int").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("ts"),
    )
