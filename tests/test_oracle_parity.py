"""Driver-contract emulation: run every queries() entry and its
oracle_sql() on the same parquet tables, compare row count, schema, and
order-insensitive values — the same gate CORRECTNESS_r{N}.json records."""

import math
import os

import duckdb
import pytest

from information_extraction_for_chinese_nlp_spark.plans import registry

SF_DIR = "/root/testdata/sf0.001"

registry._load()
ORACLED = sorted(registry.oracle_sql().keys())
ROWS_ONLY = sorted(set(registry.queries()) - set(ORACLED))


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def _canon(df):
    cols = sorted(df.columns)
    df = df[cols]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False))
    return cols, rows


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, name):
    fn = registry.queries()[name]
    sql = registry.oracle_sql()[name]

    got = fn(spark, SF_DIR).toPandas()
    want = _duck(SF_DIR, sql)

    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    gc, gr = _canon(got)
    wc, wr = _canon(want)
    assert gc == wc, f"{name}: columns {gc} != {wc}"
    mism = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b][:5]
    assert gr == wr, f"{name}: first mismatches {[(gr[i], wr[i]) for i in mism]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    fn = registry.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
