"""Distributed k-means over an embedding column — full-corpus
Lloyd's iterations in the shape MLlib uses, but expressed as pure
DataFrame operations: the k×dim centroid model lives on the driver
(bounded, like any trained model), assignment is a JVM-side column
expression against the broadcast centroid literals, and the centroid
update is ONE hash aggregation per iteration over (cluster, dim)
partial sums. Complements the IVF/IVF-PQ quantizers
(operators/similarity.py, operators/pq.py), whose k-means fits on a
bounded driver-side SAMPLE: this operator is the full-data
clustering used for corpus analysis, cluster-balanced sampling, and
SemDeDup-style pruning at scale.

Determinism contract (what makes the result golden-pinnable and
partitioning-independent): per-dimension partial sums accumulate in
DECIMAL(38,12) (exact, order-independent — float addition would make
centroids depend on partition order), centroid means are rounded to
12 decimals each round, and distances are computed in double from
those exact rounded centroids. Seeding picks the k initial centroids
by the xxhash64 order of the id column — deterministic, sample-free,
and independent of row order.

Scale shape per iteration: one corpus scan, one shuffle of
k × dim × n_partitions partial rows (map-side combine does the
heavy reduction), one k×dim collect. No iteration ever shuffles
vectors; lineage stays flat because each iteration starts from
literal centroids, not from the previous plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,12)"


def _dist2(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """array<double> of squared L2 distances to each centroid —
    whole-stage-codegen column expression, no Python."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(c)) for c in cent]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for cent in centroids
        ]
    )


def _assign(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """0-based nearest-centroid id (ties -> lowest id)."""
    d = _dist2(vec_col, centroids)
    return (F.array_position(d, F.array_min(d)) - 1).cast("int")


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 10,
) -> list[list[float]]:
    """Fit ``k`` centroids with ``n_iter`` Lloyd's rounds. Init picks
    the k vectors with the smallest ``xxhash64(id)`` (deterministic
    pseudo-random, row-order-free). Returns the centroid model
    (k lists of dim floats) — driver-side by design, like any
    trained model artifact; everything corpus-sized stays
    distributed. An emptied cluster keeps its previous centroid."""
    if k < 1:
        raise ValueError("k must be >= 1")
    seeds = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    for _ in range(n_iter):
        assigned = df.select(
            _assign(vec_col, centroids).alias("_c"),
            F.posexplode(F.col(vec_col)).alias("_dim", "_x"),
        )
        parts = (
            assigned.groupBy("_c", "_dim")
            .agg(
                F.sum(F.col("_x").cast("double").cast(_DEC)).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select(
                "_c",
                "_dim",
                F.round(F.col("_s") / F.col("_n"), 12).cast("double").alias("_m"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in parts:
            new[r["_c"]][r["_dim"]] = float(r["_m"])
        centroids = new
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Input rows + ``cluster_id`` + ``dist2`` (squared L2 to the
    assigned centroid, double) — one map-only pass against the
    broadcast centroid literals."""
    d = _dist2(vec_col, centroids)
    return df.select(
        "*",
        _assign(vec_col, centroids).alias("cluster_id"),
        F.array_min(d).alias("dist2"),
    )


def kmeans_summary(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster_id, n_members, inertia, centroid_norm) — cluster
    sizes, exact-decimal within-cluster squared-distance sums
    (rounded to 6), and the centroid L2 norm (rounded to 6) for each
    cluster, ordered by id. The standard fit diagnostic."""
    norms = [round(sum(x * x for x in c) ** 0.5, 6) for c in centroids]
    norm_arr = F.array(*[F.lit(float(n)) for n in norms])
    return (
        kmeans_assign(df, centroids, vec_col)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.sum(F.col("dist2").cast(_DEC)).cast("double"), 6).alias(
                "inertia"
            ),
        )
        .select(
            "cluster_id",
            "n_members",
            "inertia",
            F.element_at(norm_arr, F.col("cluster_id") + 1).alias("centroid_norm"),
        )
        .orderBy("cluster_id")
    )
