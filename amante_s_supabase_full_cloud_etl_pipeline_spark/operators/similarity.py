"""Embedding similarity search (charter extension, SURVEY.md §2.10):
brute-force cosine top-k baseline + random-hyperplane LSH bucketing
as the scale path.

Scale design:
- Brute force is the *correctness baseline*: broadcast the (few)
  query vectors, one map pass over the corpus computing cosine via
  array expressions (zip_with/aggregate — JVM, no Python), then a
  per-query top-k via window over the small filtered candidate set.
  At 100 TB this is a full scan — exactly what you fall back to when
  recall must be 1.0.
- LSH: H fixed hyperplanes → H sign bits → bucket id. Probing only
  the query's bucket turns top-k into a partition-pruned lookup
  (recall < 1, tunable via multi-probe). Hyperplanes are derived
  deterministically from a seed so signatures are reproducible
  across runs/engines.
- IVF: k-means coarse centroids (``ivf_topk``) — same bucket/probe
  plumbing as LSH with data-adaptive buckets; the memory-compressed
  IVF-PQ variant (product quantization + ADC + exact re-rank) lives
  in ``operators/pq.py``.

Grounding: distributed top-k similarity search shapes per EDBT 2020
(incremental top-k) / ICDE 2021 (REPOSE: distributed top-k with local
reference points) — see PAPERS.md; random-hyperplane LSH is
Charikar's SimHash family applied to embeddings.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cache import tracked_persist


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double — sequential fold, deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be tiny (it is broadcast); the corpus
    is scanned once. Scores are rounded before ranking so the
    ordering is reproducible across engines; ties break on corpus id.
    Returns (query_id, neighbor_id, score, rank).

    Scale note: ranking goes through the two-phase ``grouped_topk``
    (map-side per-partition top-k, then a ≤ k × n_partitions-rows-per-
    query final fold) instead of ``row_number() OVER (PARTITION BY
    query_id)``. The window form funnels the ENTIRE scored corpus into
    |queries| partitions — at 100 TB that is one straggler sort task
    per query; the two-phase form keeps each query's work spread
    across every corpus partition and shuffles only k survivors per
    (query, partition).
    """
    from .topk import grouped_topk

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to).alias("score"),
        )
    )
    return ranked_topk(scored, k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure-python LCG —
    reproducible everywhere, no numpy RNG state concerns)."""
    state = seed & 0x7FFFFFFF
    planes: list[list[float]] = []
    for _ in range(n_planes):
        vec = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            # Box–Muller-free symmetric variate is enough for signs.
            vec.append((state / float(1 << 31)) * 2.0 - 1.0)
        n = math.sqrt(sum(v * v for v in vec)) or 1.0
        planes.append([v / n for v in vec])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit j = [vec · plane_j > 0]."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, j))
    return bucket


def ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, score) → top-k per query via the
    bounded two-phase ``grouped_topk`` (see brute_force_topk's scale
    note — identical results to a row_number window under the
    (score desc, neighbor_id asc) total order, without the
    one-sort-task-per-query straggler). The ascending id tiebreak is
    type-agnostic (ADVICE r4): grouped_topk negates NUMERIC ids for
    the fast struct-compare path and falls back to a comparator sort
    for string/other orderable id types."""
    from .topk import grouped_topk

    top = grouped_topk(
        scored,
        group_by=["query_id"],
        order_by=["score", "neighbor_id"],
        k=k,
        ascending=["neighbor_id"],
    )
    return top.select("query_id", "neighbor_id", "score", "rank").orderBy(
        "query_id", "rank"
    )


def nearest_lists_expr(centroids: list[list[float]], vec: Column, n: int) -> Column:
    """ids of the ``n`` nearest centroids (exact L2, expression-only —
    centroids broadcast as literals into codegen). Shared by the batch
    IVF path and the streaming index (streaming/ann_index.py) so both
    assign identical lists."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("list_id"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(F.array_sort(dists), 1, n).getField("list_id")


#: absolute ceiling on rows collected for quantizer training —
#: driver memory is bounded BY CONSTRUCTION whatever the corpus size
#: or ``train_fraction`` (r12 advice: a fraction alone grows linearly
#: with the corpus). ~50k × d floats is MBs, and k-means needs no
#: more than 10⁵-ish points for a 16-256-way coarse quantizer.
MAX_TRAIN_ROWS = 50_000


def quantizer_train_sample(
    df: DataFrame,
    id_col: str,
    seed: int,
    train_fraction: float,
    max_train_rows: int,
) -> DataFrame:
    """THE quantizer sampling contract, shared by IVF and IVF-PQ:
    deterministic hash-fraction filter (partitioning-independent,
    same scan) then an absolute xxhash64-ordered ``limit`` — Spark
    plans it as TakeOrderedAndProject (per-partition top-N, no full
    sort), so the later driver collect is O(max_train_rows) by
    construction. When the cap does not bite, the kept set equals
    the plain fraction filter (existing pins unchanged)."""
    return (
        df.filter(
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(10_000))
            < F.lit(int(train_fraction * 10_000))
        )
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed + 1)), id_col)
        .limit(int(max_train_rows))
    )


def fit_coarse_centroids(
    corpus: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_fraction: float = 0.25,
    max_train_rows: int = MAX_TRAIN_ROWS,
) -> list[list[float]]:
    """Deterministic coarse-quantizer fit (pyspark.ml KMeans on a
    hash-selected sample, single sorted partition — bit-deterministic
    centroids on any cluster layout; see ivf_topk docstring for the
    scale reasoning on ``train_fraction``). The fraction-selected
    sample is then capped at ``max_train_rows`` by xxhash64 order
    (TakeOrderedAndProject — no full sort, pseudo-random keep set,
    deterministic on any partitioning); when the cap does not bite
    the kept set — and therefore every existing pin — is unchanged."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = corpus.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("_v")
    )
    train = (
        quantizer_train_sample(
            with_vec, id_col, seed, train_fraction, max_train_rows
        )
        .select(F.col(id_col), "_v")
        .coalesce(1)
        .sortWithinPartitions(id_col)
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="_v", predictionCol="_list")
    model = km.fit(train.select("_v"))
    return [list(map(float, c)) for c in model.clusterCenters()]


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket.
    One equi-join on bucket id replaces the cross join — the plan a
    1000-executor cluster wants (bucket co-location; at rest, write
    the corpus bucketed by this id so the probe is shuffle-free)."""
    planes = hyperplanes(dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to).alias("score"),
        )
    )
    return ranked_topk(scored, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    seed: int = 42,
    train_fraction: float = 0.25,
    max_train_rows: int = MAX_TRAIN_ROWS,
) -> DataFrame:
    """IVF-style ANN: k-means coarse quantizer (pyspark.ml, seeded)
    partitions the corpus into ``n_lists`` inverted lists; each query
    probes its ``n_probe`` nearest centroids and scans only those
    lists.

    This is the centroid-based sibling of :func:`lsh_topk` — same
    bucket-join plumbing, data-adaptive buckets. At scale the corpus
    is *stored* clustered by list id (partition pruning on probe).

    The quantizer trains on a ``train_fraction`` sample selected by a
    deterministic hash of the id — partitioning-independent (same
    sample on any cluster layout, unlike ``df.sample``) and computed
    in the same scan, no extra pass, then hard-capped at
    ``max_train_rows`` (xxhash64-ordered limit) so the driver-side
    collect is O(cap) BY CONSTRUCTION — at 100 TB the fraction is a
    tuning knob, not a safety valve.
    """
    # Fit comments live in fit_coarse_centroids (single sorted
    # partition on a hash-selected bounded sample → bit-deterministic
    # centroids on any layout, as the golden pin requires).
    centroids = fit_coarse_centroids(
        corpus, n_lists, id_col, vec_col, seed, train_fraction,
        max_train_rows,
    )

    def nearest_lists(vec: Column, n: int) -> Column:
        return nearest_lists_expr(centroids, vec, n)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.element_at(nearest_lists(F.col(vec_col), 1), 1).alias("list_id"),
    )
    c = tracked_persist(c)  # the inverted lists — stored clustered at scale
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(nearest_lists(F.col(vec_col), n_probe)).alias("list_id"),
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to).alias("score"),
        )
        .distinct()  # a neighbor can surface via multiple probes
    )
    return ranked_topk(scored, k)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup detection: LSH-bucketed self-join,
    verify cosine ≥ threshold. (id_a < id_b.)"""
    planes = hyperplanes(dim, n_planes)
    t = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    t = tracked_persist(t)  # both self-join sides reuse the bucketed projection
    a = t.toDF("id_a", "vec_a", "bucket")
    b = t.toDF("id_b", "vec_b", "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(cosine(F.col("vec_a"), F.col("vec_b")), round_to))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
