"""The triples_pipeline DuckDB oracle's chunk-straddle branch.

The driver gate runs at sf0.01 where every document fits one chunk, so
the oracle's tail arithmetic (a mention straddling a window boundary
matches only its in-window money PREFIX; a straddled prompt matches
nothing) would otherwise be dead code on both sides. Here document
lengths sweep the boundary so some (doc, entity, money) picks straddle,
and Spark must equal DuckDB on the full row set — same canonicalization
as the driver (sorted columns, 6-decimal doubles)."""

import math
import os

import duckdb
import pytest

from information_extraction_for_chinese_nlp_spark.plans.queries_extraction import (
    _triples_sql,
    triples_pipeline,
)


def _canon(df):
    cols = sorted(df.columns)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    return cols, sorted(
        tuple(norm(v) for v in r) for r in df[cols].itertuples(index=False)
    )


def test_straddle_arithmetic_matches_oracle(spark, tmp_path):
    # window W = 512 - len(entity) - 3 ∈ {503, 505}; mention lands at
    # p = len//3 (plain 'a' text: no removable chars, so the scrubbed
    # prefix equals the raw prefix). Sweep p across [488, 525] to hit
    # full-fit, money-cut, and prompt-cut regimes for every md5 pick.
    rows = [(i, "a" * (3 * L)) for i, L in enumerate(range(488, 526))]
    # plus a couple of multi-chunk docs whose mention sits mid-chunk
    rows += [(100, "a" * 1800), (101, "a" * 2400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )

    got = triples_pipeline(spark, sf_dir).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = con.execute(_triples_sql()).df()

    assert _canon(got) == _canon(want)

    # the sweep must actually exercise the straddle regimes, or this
    # test silently degenerates to the single-chunk case:
    full_surfaces = {
        "98,532元", "1,680元", "八萬元", "三千500元", "一萬五千元",
        "六百二十五元", "2,954元", "五萬三千元", "10000元", "七百元",
    }
    objs = set(got["obj"])
    assert objs & full_surfaces, "some mentions must fit whole"
    partials = objs - full_surfaces
    assert partials, (
        "sweep failed to produce any boundary-cut money prefix — "
        "widen the length range"
    )
    # and at least one doc must lose its mention entirely (prompt cut)
    assert len(got) < len(rows), "some prompt should straddle and drop"
