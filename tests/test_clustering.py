"""Distributed k-means: planted-cluster recovery, partitioning
independence (the determinism contract behind the golden pin),
empty-cluster survival, and inertia improvement over iterations."""

from __future__ import annotations

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_summary,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def planted(spark):
    # two tight planted clusters around (0,0,0,0) and (10,10,10,10)
    rows = [(i, [0.0 + i * 0.01, 0.1, 0.0, 0.1]) for i in range(20)]
    rows += [(100 + i, [10.0 + i * 0.01, 10.1, 10.0, 10.1]) for i in range(20)]
    return _vecs(spark, rows)


def test_planted_clusters_recovered(spark, planted):
    centroids = kmeans_fit(planted, k=2, n_iter=5)
    assigned = kmeans_assign(planted, centroids).collect()
    by_cluster = {}
    for r in assigned:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    groups = sorted(by_cluster.values(), key=lambda s: min(s))
    assert groups == [set(range(20)), set(range(100, 120))]


def test_partitioning_independence(spark, planted):
    """Exact-decimal partial sums make centroids identical whatever
    the partition layout — the golden-pin soundness argument."""
    a = kmeans_fit(planted.repartition(1), k=2, n_iter=3)
    b = kmeans_fit(planted.repartition(7), k=2, n_iter=3)
    assert a == b
    sa = [tuple(r) for r in kmeans_summary(planted.repartition(1), a).collect()]
    sb = [tuple(r) for r in kmeans_summary(planted.repartition(7), b).collect()]
    assert sa == sb


def test_empty_cluster_keeps_centroid(spark):
    # 3 centroids over 2 distinct points: one cluster must empty out
    # and keep its previous centroid without erroring
    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [5.0, 5.0])]
    centroids = kmeans_fit(_vecs(spark, rows), k=3, n_iter=3)
    assert len(centroids) == 3


def test_more_iterations_do_not_worsen_inertia(spark, planted):
    def inertia(n_iter):
        c = kmeans_fit(planted, k=2, n_iter=n_iter)
        return sum(r["inertia"] for r in kmeans_summary(planted, c).collect())

    assert inertia(5) <= inertia(1) + 1e-9
