"""ANN paths: IVF recall vs brute force; LSH bucket determinism."""

from pyspark.sql import functions as F

from information_extraction_for_chinese_nlp_spark.operators.similarity import (
    brute_force_topk,
    hyperplane_lsh_buckets,
    ivf_topk,
)


def test_ivf_recall_against_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 20)

    exact = brute_force_topk(emb, queries, k=3).toPandas()
    approx = ivf_topk(emb, queries, k=3, n_cells=8, n_probe=4).toPandas()

    exact_pairs = set(zip(exact.qid, exact.nid))
    approx_pairs = set(zip(approx.qid, approx.nid))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # half the cells probed -> decent recall; exact bound depends on the
    # synthetic cluster structure (labels), which k-means recovers well
    assert recall >= 0.6, f"IVF recall@3 = {recall}"

    # full probe = exact search
    full = ivf_topk(emb, queries, k=3, n_cells=8, n_probe=8).toPandas()
    assert set(zip(full.qid, full.nid)) == exact_pairs


def test_lsh_buckets_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = hyperplane_lsh_buckets(emb, n_planes=6).toPandas().set_index("vec_id")
    b = hyperplane_lsh_buckets(emb, n_planes=6).toPandas().set_index("vec_id")
    assert (a.bucket == b.bucket).all()
    assert a.bucket.str.len().eq(6).all()
