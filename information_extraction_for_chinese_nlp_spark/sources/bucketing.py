"""Bucketed (co-located) joins — the shuffle-elimination path for the
recurring big-big joins at 100 TB.

A join between two tables bucketed by the same key into the same bucket
count needs no Exchange: each task sort-merges matching buckets in
place. Use for edges↔vertices and extraction↔gold-eval joins that
repeat across runs — pay the bucketing shuffle once at write time,
never again at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16,
                   sort_by: str | None = None) -> None:
    """Persist df as a bucketed managed table (overwrites)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.bucketBy(n_buckets, key)
    writer = writer.sortBy(sort_by or key)
    writer.mode("overwrite").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    physical plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
