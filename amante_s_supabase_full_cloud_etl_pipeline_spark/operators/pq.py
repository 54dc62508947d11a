"""IVF-PQ approximate nearest neighbors (FAISS-style inverted lists +
product quantization) — the memory-compressed ANN scale path that
complements the engine's other similarity operators
(operators/similarity.py): brute force (recall 1.0 full scan), LSH
(data-oblivious buckets), IVF (data-adaptive buckets, full vectors).
IVF-PQ stores each database vector as ``m`` one-byte codes instead of
``dim`` floats — at 100 TB of embeddings the difference between an
index that fits in cluster memory and one that doesn't.

Standard recipe, Spark-shaped:

1. **Train** (driver, bounded): a deterministic hash-selected sample
   (id-keyed — identical on any partitioning, same pattern as
   ``ivf_topk``) is collected and a seeded numpy Lloyd's k-means
   fits the ``n_lists`` coarse centroids; per PQ subspace, a second
   k-means over the sample's RESIDUALS (x − coarse centroid) fits a
   ``n_codes``-entry codebook. All float reductions happen on one
   sorted sample — bit-deterministic.
2. **Encode** (one Arrow kernel pass over the corpus): nearest coarse
   centroid → ``list_id``; residual split into ``m`` subvectors, each
   replaced by its nearest codebook id → ``codes array<int>`` (m
   small ints per vector — the compressed index).
3. **Search**: queries probe their ``n_probe`` nearest lists (bucket
   equi-join — the same partition-pruned shape as IVF/LSH); an
   asymmetric-distance (ADC) kernel scores candidates straight from
   the codes via per-(query, list) lookup tables (``m × n_codes``
   floats each, built once per pair inside the kernel — never a
   per-candidate vector fetch); the top ``refine × k`` ADC candidates
   per query are RE-RANKED with exact cosine against the full
   vectors, so the emitted scores are exact and PQ error only affects
   which candidates get considered — the standard ADC + re-rank
   contract, and what makes recall directly measurable against the
   brute-force baseline.

At rest, the corpus is stored clustered by ``list_id`` with the codes
column colocated — probes prune partitions, the re-rank join fetches
only ``refine × k`` full vectors per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .cache import tracked_persist


def _kmeans(X, k: int, iters: int = 12):
    """Deterministic Lloyd's k-means: index-spread init (no RNG),
    fixed iteration count, empty clusters keep their previous
    centroid. X is (n, d) float64; returns (k, d) float64."""
    import numpy as np

    n = len(X)
    if n == 0:
        raise ValueError("empty training sample")
    init_idx = np.linspace(0, n - 1, num=min(k, n)).astype(int)
    C = X[init_idx].copy()
    if len(C) < k:  # tiny sample: pad by repeating (harmless)
        C = np.vstack([C] * (k // len(C) + 1))[:k]
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def _train_ivfpq(
    corpus: DataFrame,
    n_lists: int,
    m: int,
    n_codes: int,
    id_col: str,
    vec_col: str,
    seed: int,
    train_fraction: float,
    max_train_rows: int,
):
    """(coarse (n_lists,d), codebooks (m,n_codes,d/m)) from a bounded
    deterministic sample — the only driver-side step, same contract
    as ivf_topk's quantizer fit: fraction-filtered, then hard-capped
    at ``max_train_rows`` by xxhash64 order so the collect is O(cap)
    whatever the corpus size; the final by-id sort keeps X's row
    order (and so the pinned codebooks) unchanged when the cap does
    not bite."""
    import numpy as np

    from .similarity import quantizer_train_sample

    sample_rows = (
        quantizer_train_sample(
            corpus.select(
                F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
            ),
            "_id", seed, train_fraction, max_train_rows,
        )
        .orderBy("_id")
        .collect()
    )
    X = np.array([list(map(float, r["_v"])) for r in sample_rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    coarse = _kmeans(X, n_lists)
    d2 = ((X[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    resid = X - coarse[d2.argmin(axis=1)]
    ds = dim // m
    books = np.stack(
        [_kmeans(resid[:, j * ds : (j + 1) * ds], n_codes) for j in range(m)]
    )
    return coarse, books


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    seed: int = 42,
    train_fraction: float = 0.25,
    max_train_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF-PQ with exact
    re-ranking. Returns (query_id, neighbor_id, score, rank) with
    EXACT cosine scores (PQ decides only which ``refine*k`` ADC
    candidates per (query, probe) reach the re-rank)."""
    import numpy as np

    from .similarity import cosine

    from .similarity import MAX_TRAIN_ROWS

    coarse, books = _train_ivfpq(
        corpus, n_lists, m, n_codes, id_col, vec_col, seed,
        train_fraction,
        MAX_TRAIN_ROWS if max_train_rows is None else max_train_rows,
    )
    dim = coarse.shape[1]
    ds = dim // m
    coarse_l = coarse.tolist()
    books_l = books.tolist()

    encode_schema = StructType(
        [
            StructField("neighbor_id", LongType()),
            StructField("list_id", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def encode(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(coarse_l)
        B = np.asarray(books_l)
        for batch in batches:
            if not len(batch):
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in batch["_v"]])
            d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            lists = d2.argmin(axis=1)
            R = V - C[lists]
            codes = np.empty((len(V), m), dtype=np.int64)
            for j in range(m):
                sub = R[:, j * ds : (j + 1) * ds]
                dj = ((sub[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = dj.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": batch["_id"].astype("int64"),
                    "list_id": pd.Series(lists, dtype="int32"),
                    "codes": [c.tolist() for c in codes.astype("int32")],
                }
            )

    encoded = tracked_persist(
        corpus.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
        ).mapInPandas(encode, encode_schema)
    )

    # queries probe their n_probe nearest coarse centroids (expression-
    # only exact L2 — queries are dimension-tiny and broadcast)
    def nearest_lists(vec, n):
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
                for i, c in enumerate(coarse_l)
            ]
        )
        return F.slice(F.array_sort(dists), 1, n).getField("list_id")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(nearest_lists(F.col(vec_col), n_probe)).alias("list_id"),
    )

    adc_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("adc", DoubleType()),
        ]
    )

    def adc(batches):
        """Approximate L2(query, candidate)² = Σ_j T[j][code_j] with
        T built once per (query, list) — the asymmetric distance
        computation; candidates never load their full vectors here."""
        import numpy as np
        import pandas as pd

        C = np.asarray(coarse_l)
        B = np.asarray(books_l)
        tables: dict = {}
        for batch in batches:
            if not len(batch):
                continue
            out = np.empty(len(batch), dtype=np.float64)
            codes = np.array([np.asarray(c) for c in batch["codes"]])
            for key, idx in batch.groupby(["query_id", "list_id"]).groups.items():
                qid, lid = key
                if key not in tables:
                    qv = np.asarray(
                        batch["q_vec"].iloc[batch.index.get_loc(idx[0])], dtype=np.float64
                    )
                    r = qv - C[int(lid)]
                    tables[key] = np.stack(
                        [
                            ((r[j * ds : (j + 1) * ds][None, :] - B[j]) ** 2).sum(axis=1)
                            for j in range(m)
                        ]
                    )
                T = tables[key]
                rows = batch.index.get_indexer(idx)
                sub = codes[rows]
                out[rows] = T[np.arange(m)[None, :], sub].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": batch["query_id"].astype("int64"),
                    "neighbor_id": batch["neighbor_id"].astype("int64"),
                    "adc": out,
                }
            )

    from pyspark.sql import Window

    candidates = encoded.join(F.broadcast(q), "list_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    approx = candidates.select("query_id", "q_vec", "list_id", "neighbor_id", "codes").mapInPandas(
        adc, adc_schema
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        approx.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= refine * k)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: fetch full vectors for the shortlist only
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
