"""Similarity search: brute-force exactness + LSH recall against it."""

from __future__ import annotations

import math

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    random_hyperplanes,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.sources import read_parquet_table

from conftest import SF_DIR


def test_topk_self_is_first(spark):
    emb = read_parquet_table(spark, SF_DIR, "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    rows = cosine_topk(emb, "vec_id", "embedding", qv, k=5).collect()
    assert rows[0].vec_id == 0
    assert math.isclose(rows[0].score, 1.0, abs_tol=1e-6)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_lsh_topk_recall(spark):
    emb = read_parquet_table(spark, SF_DIR, "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    # These embeddings are near-orthogonal (max pairwise cos ~0.5), the
    # hard case for hyperplane LSH — 4 bits + radius 2 probes 11/16 of the
    # space and measures 7/10 recall; pin a conservative floor.
    planes = random_hyperplanes(n_bits=4, dim=64, seed=42)
    exact = {r.vec_id for r in cosine_topk(emb, "vec_id", "embedding", qv, k=10).collect()}
    approx = {
        r.vec_id
        for r in cosine_topk_lsh(
            emb, "vec_id", "embedding", qv, planes, k=10, probe_radius=2
        ).collect()
    }
    assert 0 in approx  # the query vector itself is always in its own bucket
    assert len(exact & approx) >= 5


def test_bucketize_deterministic(spark):
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.similarity import (
        bucketize_hyperplane,
    )

    emb = read_parquet_table(spark, SF_DIR, "embeddings").limit(20)
    planes = random_hyperplanes(n_bits=6, dim=64, seed=42)
    a = {r.vec_id: r.bucket for r in bucketize_hyperplane(emb, "embedding", planes).collect()}
    b = {r.vec_id: r.bucket for r in bucketize_hyperplane(emb, "embedding", planes).collect()}
    assert a == b
    assert all(0 <= v < 64 for v in a.values())


def test_ivf_topk_recall(spark):
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.similarity import (
        cosine_topk_ivf,
        train_ivf_centroids,
    )

    emb = read_parquet_table(spark, SF_DIR, "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    centroids = train_ivf_centroids(emb, "embedding", n_clusters=8, seed=42)
    exact = {r.vec_id for r in cosine_topk(emb, "vec_id", "embedding", qv, k=10).collect()}
    approx = {
        r.vec_id
        for r in cosine_topk_ivf(
            emb, "vec_id", "embedding", qv, centroids, k=10, n_probe=4
        ).collect()
    }
    assert 0 in approx
    assert len(exact & approx) >= 5  # half the clusters probed → decent recall


def test_ivf_centroids_deterministic(spark):
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.similarity import (
        train_ivf_centroids,
    )

    emb = read_parquet_table(spark, SF_DIR, "embeddings")
    a = train_ivf_centroids(emb, "embedding", n_clusters=4, seed=7)
    b = train_ivf_centroids(emb, "embedding", n_clusters=4, seed=7)
    assert a == b


def test_ann_table_partition_pruning(spark, tmp_path):
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.similarity import (
        build_ann_table,
        cosine_topk_ivf,
        query_ann_table,
    )
    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.inspect import plan_text

    emb = read_parquet_table(spark, SF_DIR, "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    path = str(tmp_path / "ann")
    centroids = build_ann_table(emb, path, n_clusters=8, seed=42)

    df = query_ann_table(spark, path, "vec_id", "embedding", qv, centroids, n_probe=3)
    txt = plan_text(df)
    # the cluster filter must be a PARTITION filter (pruned pre-scan),
    # not a data filter
    assert "PartitionFilters: [cluster" in txt.replace("PartitionFilters: [ cluster", "PartitionFilters: [cluster")

    # materialized index returns the same ids as the in-memory IVF path
    live = cosine_topk_ivf(emb, "vec_id", "embedding", qv, centroids, n_probe=3)
    assert {r.vec_id for r in df.collect()} == {r.vec_id for r in live.collect()}
