"""Connected components over near-duplicate pair tables (charter
extension, SURVEY.md §2.10).

Near-dup detection (Jaccard / MinHash / SimHash / embedding cosine —
operators/dedup.py, operators/similarity.py) emits PAIRS, but
"keep one document per duplicate cluster" needs the transitive
closure: if A~B and B~C, then {A, B, C} is one group even when A~C
was never emitted. That closure is exactly connected components on
the pair graph.

Scale design (the whole point at 100 TB):
- **Alternating large-star / small-star contraction** (the
  MapReduce-era CC algorithm of Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) — O(log^2 n) rounds
  in the worst case and 2-4 rounds on real dedup graphs, where
  components are small and dense. Label-propagation ("min of my
  neighbors, repeat") needs O(diameter) rounds — a 10k-long chain of
  pairwise-similar crawl dups would take 10k shuffles; star
  contraction collapses it in ~25.
- Every round is hash-shuffle relational work: one groupBy(min) and
  one equi-join per star step, all on the node-id key. No
  collect_list of neighbor sets (a hub node's adjacency never
  materializes as one array), no driver-side graph.
- **Lineage truncation**: iterative self-referencing plans grow
  exponentially in Catalyst; each round ends in an eager
  localCheckpoint. On a real cluster point
  ``spark.sparkContext.setCheckpointDir`` at durable storage and
  swap ``localCheckpoint`` for ``checkpoint`` — same contract.
- **Convergence check** is a 2-scalar aggregate per round
  (edge count + order-independent bit_xor fingerprint of the
  canonical edge set), not a subtract/except of 100 TB edge tables.
  Identical fingerprints with identical counts on consecutive
  rounds stop the loop; both are exact functions of the edge SET,
  and the contraction is monotone, so a stop is only declared on a
  true fixed point of the round function.

Component ids are the MINIMUM member id — deterministic across runs
and partitionings, so downstream "keep min id per group" survivors
are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's local min
    (including u itself): (v, min(N(u) ∪ {u})) for v ∈ N(u), v > u."""
    bidir = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = bidir.groupBy("u").agg(F.min("v").alias("_mn"))
    return (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("u"),
            F.least(F.col("u"), F.col("_mn")).alias("v"),
        )
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high→low, then connect every low neighbor AND the
    center itself to the center's min neighbor."""
    oriented = (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"),
            F.least("u", "v").alias("v"),
        )
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("_m"))
    neighbors = oriented.join(mins, "u").select(
        F.col("v").alias("u"), F.col("_m").alias("v")
    )
    centers = mins.select("u", F.col("_m").alias("v"))
    return neighbors.unionAll(centers).filter(F.col("u") != F.col("v")).distinct()


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int | None]:
    """(count, xor-of-hashes) of the canonical undirected edge set —
    order-independent, overflow-free (bit_xor, not sum: ANSI-mode sum
    raises on long overflow), and exact on the SET because the input
    is distinct."""
    row = (
        edges.select(F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b"))
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        )
        .first()
    )
    return (row["n"], row["h"])


def _components_with_rounds(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> tuple[DataFrame, int]:
    """(labels, rounds_run) — see connected_components."""
    edges = (
        pairs.select(
            F.col(id_a).cast("long").alias("u"),
            F.col(id_b).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _edge_fingerprint(edges)
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _edge_fingerprint(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(bound is ~2*log2(n)^2; raise max_rounds)"
        )
    # At the fixed point every edge is (member, root) with root the
    # component min; roots label themselves.
    labels = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionAll(
            edges.select(F.col("v").alias("node"), F.col("v").alias("component"))
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    return labels, rounds


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components of the undirected graph given as a pair
    table. Returns (node, component) for every node that appears in
    some pair, where ``component`` is the minimum node id reachable
    from ``node`` — singletons (docs with no near-dup pair) are not
    emitted; callers re-attach them with a left join +
    ``coalesce(component, id)``, which keeps this operator
    pair-table-sized rather than corpus-sized."""
    labels, _ = _components_with_rounds(pairs, id_a, id_b, max_rounds)
    return labels


def dup_group_stats(labels: DataFrame) -> DataFrame:
    """(node, component, group_size) — size via a component-partitioned
    window: one shuffle on component, never a global window."""
    from pyspark.sql import Window

    return labels.withColumn(
        "group_size", F.count(F.lit(1)).over(Window.partitionBy("component"))
    )


def keep_group_canonical(docs: DataFrame, labels: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Near-dup dedup survivors: drop every pair-graph node except its
    component's canonical (min-id) member; docs with no near-dup pair
    survive untouched. One broadcast-or-shuffle join on the id — the
    labels table is pair-graph-sized (usually ≪ corpus)."""
    drop = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
