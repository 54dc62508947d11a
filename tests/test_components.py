"""Connected components (large-star/small-star contraction) vs an
in-test union-find reference, on graphs chosen to stress the
algorithm's failure modes: long chains (diameter ≫ rounds), hubs,
multi-component mixes, and seeded random graphs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.components import (
    _components_with_rounds,
    connected_components,
    dup_group_stats,
    keep_group_canonical,
)


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_cc(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_chain_collapses_in_logarithmic_rounds(spark):
    # Worst case for label propagation (O(diameter) rounds); star
    # contraction must stay logarithmic.
    chain = [(i, i + 1) for i in range(256)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    labels, rounds = _components_with_rounds(df)
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(257)}
    assert rounds <= 12


def test_mixed_components_match_union_find(spark):
    pairs = (
        [(1, 2), (2, 3), (3, 1)]          # triangle
        + [(10, 11)]                       # pair
        + [(20, 21), (21, 22), (22, 23)]   # path
        + [(30, 31), (30, 32), (30, 33)]   # hub
    )
    assert _spark_cc(spark, pairs) == _union_find(pairs)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(trial * 1000, trial * 1000 + 120))
        pairs = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(90)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _spark_cc(spark, pairs) == _union_find(pairs)


def test_deterministic_across_runs_and_input_order(spark):
    pairs = [(5, 9), (9, 2), (40, 41), (3, 2)]
    assert _spark_cc(spark, pairs) == _spark_cc(spark, list(reversed(pairs)))


def test_labels_are_a_propagation_fixed_point(spark):
    """Cross-check the converged labels against one step of min-label
    propagation over the ORIGINAL pairs: no node can see a smaller
    label through any neighbor."""
    rng = random.Random(13)
    pairs = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    labels = connected_components(df)
    edges = df.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).unionAll(
        df.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    improved = (
        edges.join(labels.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("component", "cu")
        .join(
            labels.select(
                F.col("node").alias("v"), F.col("component").alias("cv")
            ),
            "v",
        )
        .filter(F.col("cv") < F.col("cu"))
    )
    assert improved.count() == 0


def test_group_stats_and_canonical_survivors(spark):
    pairs = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    labels = connected_components(df)
    stats = {
        (r["node"], r["component"]): r["group_size"]
        for r in dup_group_stats(labels).collect()
    }
    assert stats == {(1, 1): 3, (2, 1): 3, (3, 1): 3, (10, 10): 2, (11, 10): 2}

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in [1, 2, 3, 10, 11, 99]], "doc_id long, text string"
    )
    survivors = sorted(
        r["doc_id"] for r in keep_group_canonical(docs, labels).collect()
    )
    # min per group survives; singleton 99 untouched
    assert survivors == [1, 10, 99]


def test_empty_and_self_pairs(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
    selfy = spark.createDataFrame([(4, 4)], "id_a long, id_b long")
    assert connected_components(selfy).count() == 0
