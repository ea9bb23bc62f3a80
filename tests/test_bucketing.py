"""Co-located bucketed join: correct results AND a shuffle-free plan."""

from pyspark.sql import functions as F

from information_extraction_for_chinese_nlp_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(1500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    old_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(left, "t_bucket_left", "k", n_buckets=8)
        write_bucketed(right, "t_bucket_right", "k", n_buckets=8)

        joined = bucketed_join(spark, "t_bucket_left", "t_bucket_right", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # correctness: equals the plain join
        got = joined.agg(F.count("*"), F.sum("lv"), F.sum("rv")).collect()[0]
        want = (
            left.join(right, "k")
            .agg(F.count("*"), F.sum("lv"), F.sum("rv"))
            .collect()[0]
        )
        assert tuple(got) == tuple(want)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_threshold)
        spark.sql("DROP TABLE IF EXISTS t_bucket_left")
        spark.sql("DROP TABLE IF EXISTS t_bucket_right")
